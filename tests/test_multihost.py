"""Multi-host execution: 2 processes x 4 CPU devices over jax.distributed.

BASELINE.md requires a multi-host story; the parity check here is the
multi-process analog of test_product.py: the same sharded bg run over the
same 8-device mesh must produce the same tallies whether the 8 devices
live in one process or in two (the product mesh and RNG identity are
process-count invariant).
"""

import os
import socket
import subprocess
import sys

import numpy as np

import _mh_worker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_parity():
    port = _free_port()
    coord = "127.0.0.1:%d" % port
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
        lines = [ln for ln in out.splitlines() if ln.startswith("MH_RESULT")]
        assert lines, out + err
        outs.append(lines[0])
    # both processes computed the same replicated results
    assert outs[0] == outs[1]
    _, tabs_s, esc_s, intf_s = outs[0].split()
    esc_mh = np.asarray([float(v) for v in esc_s.split(",")])

    # single-process reference on the same 8 (virtual) devices
    tabs, esc, intf = _mh_worker.run(8)
    np.testing.assert_allclose(float(tabs_s), float(np.float64(tabs).sum()),
                               rtol=2e-6)
    np.testing.assert_allclose(esc_mh, esc, rtol=2e-4)
    np.testing.assert_allclose(float(intf_s),
                               float(np.float64(intf).sum()), rtol=2e-6)


def test_two_process_full_ini_parity(tmp_path):
    """The FULL ini product path (iterations + absorbed + solve + maps,
    `devices 8`) across 2 processes must reproduce the single-process
    8-device run: driver.run itself is multi-host-invariant, not just the
    sharded bg kernel (VERDICT r3 item 7)."""
    import _mh_ini_worker
    port = _free_port()
    coord = "127.0.0.1:%d" % port
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "_mh_ini_worker.py")
    wd = str(tmp_path)
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i), wd],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MH_INI_RESULT")]
        assert lines, out + err
        outs.append(lines[0])
    assert outs[0] == outs[1]
    tabs_mh, tsum_mh, tmax_mh, msum_mh = [
        float(v) for v in outs[0].split()[1:]]

    # single-process reference (this test process has 8 CPU devices)
    ini = _mh_ini_worker.prepare(wd)
    res = _mh_ini_worker.run(ini, os.path.join(wd, "single"))
    t = np.asarray(res.temperature, np.float64)
    np.testing.assert_allclose(tabs_mh,
                               float(np.float64(np.asarray(res.ctabs)).sum()),
                               rtol=2e-5)
    np.testing.assert_allclose(tsum_mh, float(t.sum()), rtol=1e-5)
    np.testing.assert_allclose(tmax_mh, float(t.max()), rtol=1e-4)
    np.testing.assert_allclose(
        msum_mh, float(np.asarray(res.maps[0], np.float64).sum()),
        rtol=2e-4)
