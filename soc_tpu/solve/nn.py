"""Neural-network emission surrogate (the ASOC_aux_NN.py capability).

Learns the per-cell mapping log(absorptions at a few reference wavelengths)
-> log(emission spectrum), replacing the expensive per-cell A2E solve for
repeated runs (reference: PyTorch MLP with LeakyReLU hidden layers,
configurable like nnnet=[13,17,13]; ASOC_aux_NN.py:32-210). Implemented with
flax + optax; weights stored as a plain pickled pytree in <prefix>.nn.
"""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class EmissionMLP(nn.Module):
    hidden: tuple
    n_out: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.Dense(h)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.n_out)(x)


def _log_standardize(x, eps=1e-33):
    lx = np.log10(np.maximum(np.asarray(x, np.float64), eps))
    mu = lx.mean(axis=0)
    sd = lx.std(axis=0) + 1e-8
    return ((lx - mu) / sd).astype(np.float32), mu, sd


def nn_fit(absorbed, emitted, hidden=(13, 17, 13), epochs=400, lr=3e-3,
           batch=4096, seed=0, verbose=False):
    """Train the surrogate on [N, n_abs] -> [N, n_emit] cell samples.

    Returns a model dict (weights + input/output normalizations) suitable
    for nn_save/nn_solve.
    """
    x, in_mu, in_sd = _log_standardize(absorbed)
    y, out_mu, out_sd = _log_standardize(emitted)
    model = EmissionMLP(hidden=tuple(hidden), n_out=y.shape[1])
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, x.shape[1])))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = model.apply(p, xb)
            return jnp.mean((pred - yb) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = x.shape[0]
    rng = np.random.default_rng(seed)
    xd, yd = jnp.asarray(x), jnp.asarray(y)
    loss = None
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i0 in range(0, n, batch):
            sel = order[i0:i0 + batch]
            params, opt_state, loss = step(params, opt_state, xd[sel],
                                           yd[sel])
        if verbose and epoch % 50 == 0:
            print(f"  nn_fit epoch {epoch}: loss {float(loss):.5f}")
    return dict(params=params, hidden=tuple(hidden),
                in_mu=in_mu, in_sd=in_sd, out_mu=out_mu, out_sd=out_sd,
                n_out=y.shape[1])


def nn_solve(model_dict, absorbed, batch=1 << 16):
    """Evaluate the surrogate: [CELLS, n_abs] -> [CELLS, n_emit]."""
    model = EmissionMLP(hidden=model_dict["hidden"],
                        n_out=model_dict["n_out"])
    lx = np.log10(np.maximum(np.asarray(absorbed, np.float64), 1e-33))
    x = ((lx - model_dict["in_mu"]) / model_dict["in_sd"]).astype(np.float32)

    # params as a traced argument: a closure would constant-fold the
    # weights into the executable and recompile on every nn_solve call
    apply = jax.jit(lambda params, xb: model.apply(params, xb))

    outs = []
    for i0 in range(0, x.shape[0], batch):
        outs.append(np.asarray(apply(model_dict["params"],
                                     jnp.asarray(x[i0:i0 + batch]))))
    ly = np.concatenate(outs) * model_dict["out_sd"] + model_dict["out_mu"]
    return (10.0 ** ly).astype(np.float32)


def nn_save(path, model_dict):
    with open(path, "wb") as fp:
        pickle.dump(jax.device_get(model_dict), fp)


def nn_load(path):
    with open(path, "rb") as fp:
        return pickle.load(fp)
