"""Minimal FITS image writer (no astropy dependency).

Covers the reference's MakeFits usage (ASOC_aux.py:1723): float32 image HDUs
with a gnomonic (RA---TAN / DEC--TAN) WCS, used for the FITS / savetau /
colden / polmap outputs. Standard-conforming single-HDU files: 80-char
cards in 2880-byte header blocks, big-endian float32 data padded to 2880.
"""

import numpy as np


def _card(key, value, comment=""):
    if isinstance(value, bool):
        v = "T" if value else "F"
        txt = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, np.integer)):
        txt = f"{key:<8}= {value:>20d}"
    elif isinstance(value, (float, np.floating)):
        txt = f"{key:<8}= {value:>20.12E}"
    else:
        txt = f"{key:<8}= '{str(value):<8}'"
    if comment:
        txt += f" / {comment}"
    return txt[:80].ljust(80)


def write_fits_image(path, data, ra_deg=0.0, de_deg=0.0, pix_deg=None,
                     bunit="Jy/sr"):
    """Write a float32 FITS image (2-D [NY,NX] or 3-D cube [NF,NY,NX])."""
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data[None]
    nf, ny, nx = data.shape
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", -32),
        _card("NAXIS", 3 if nf > 1 else 2),
        _card("NAXIS1", nx),
        _card("NAXIS2", ny),
    ]
    if nf > 1:
        cards.append(_card("NAXIS3", nf))
    cards += [
        _card("CRPIX1", 0.5 * (nx + 1)),
        _card("CRPIX2", 0.5 * (ny + 1)),
        _card("CRVAL1", float(ra_deg)),
        _card("CRVAL2", float(de_deg)),
        _card("CTYPE1", "RA---TAN"),
        _card("CTYPE2", "DEC--TAN"),
        _card("BUNIT", bunit),
        _card("ORIGIN", "soc_tpu"),
    ]
    if pix_deg is not None:
        cards.insert(7, _card("CDELT1", -float(pix_deg)))
        cards.insert(8, _card("CDELT2", float(pix_deg)))
    cards.append("END".ljust(80))
    header = "".join(cards)
    header += " " * ((2880 - len(header) % 2880) % 2880)
    payload = (data[0] if nf == 1 else data).astype(">f4").tobytes()
    payload += b"\0" * ((2880 - len(payload) % 2880) % 2880)
    with open(path, "wb") as fp:
        fp.write(header.encode("ascii"))
        fp.write(payload)


def read_fits_image(path):
    """Minimal reader (for round-trip tests): returns (data, header dict)."""
    with open(path, "rb") as fp:
        raw = fp.read()
    hdr = {}
    pos = 0
    while True:
        block = raw[pos:pos + 2880].decode("ascii")
        pos += 2880
        done = False
        for i in range(0, 2880, 80):
            card = block[i:i + 80]
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if "=" in card:
                val = card.split("=", 1)[1].split("/")[0].strip()
                hdr[key] = val.strip("' ")
        if done:
            break
    shape = [int(hdr[f"NAXIS{i}"])
             for i in range(int(hdr["NAXIS"]), 0, -1)]
    n = int(np.prod(shape))
    data = np.frombuffer(raw[pos:pos + 4 * n], dtype=">f4").reshape(shape)
    return np.asarray(data, np.float32), hdr
