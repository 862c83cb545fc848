"""Parse the BIP-327 MuSig2 test vectors from the reference's generated
vectors.h (data, not code; generated from the BIP repository by
tools/test_vectors_musig2_generate.py).  Skippable if absent."""

from __future__ import annotations

import os
import re

VECTORS_H = "/root/reference/src/modules/musig/vectors.h"


def _parse_initializer(text: str):
    """Parse a C initializer {...} into nested Python lists."""
    tok = re.findall(r"\{|\}|[A-Za-z_][A-Za-z0-9_]*|0[xX][0-9a-fA-F]+|\d+",
                     text)
    pos = 0

    def parse():
        nonlocal pos
        assert tok[pos] == "{"
        pos += 1
        out = []
        while tok[pos] != "}":
            if tok[pos] == "{":
                out.append(parse())
            else:
                t = tok[pos]
                pos += 1
                if t.startswith(("0x", "0X")):
                    out.append(int(t, 16))
                elif t.isdigit():
                    out.append(int(t))
                else:
                    out.append(t)  # enum name
        pos += 1
        return out

    return parse()


def _extract(name: str, src: str):
    m = re.search(rf"{name}\s*=\s*", src)
    assert m, name
    start = src.index("{", m.end())
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                return _parse_initializer(src[start:i + 1])
    raise ValueError(name)


def available() -> bool:
    return os.path.exists(VECTORS_H)


def load():
    with open(VECTORS_H) as f:
        src = f.read()
    # strip comments
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r"//[^\n]*", "", src)

    def by(x):
        return bytes(x)

    out = {}

    ka = _extract("musig_key_agg_vector", src)
    out["key_agg"] = {
        "pubkeys": [by(p) for p in ka[0]],
        "tweaks": [by(t) for t in ka[1]],
        "valid": [{"indices": c[1], "expected": by(c[2])} for c in ka[2]],
        "error": [{"indices": c[1], "tweak_indices": c[3],
                   "is_xonly": c[4], "error": c[5]} for c in ka[3]],
    }

    ng = _extract("musig_nonce_gen_vector", src)
    cases = []
    for c in ng[0]:
        cases.append({
            "rand": by(c[0]),
            "sk": by(c[2]) if c[1] else None,
            "pk": by(c[3]),
            "aggpk": by(c[5]) if c[4] else None,
            "msg": by(c[7]) if c[6] else None,
            "extra": by(c[9]) if c[8] else None,
            "expected_secnonce": by(c[10]),
            "expected_pubnonce": by(c[11]),
        })
    out["nonce_gen"] = cases

    na = _extract("musig_nonce_agg_vector", src)
    out["nonce_agg"] = {
        "pnonces": [by(p) for p in na[0]],
        "valid": [{"indices": c[0], "expected": by(c[1])} for c in na[1]],
        "error": [{"indices": c[0]} for c in na[2]],
    }

    sv = _extract("musig_sign_verify_vector", src)
    out["sign_verify_raw"] = sv
    tw = _extract("musig_tweak_vector", src)
    out["tweak_raw"] = tw
    sa = _extract("musig_sig_agg_vector", src)
    out["sig_agg_raw"] = sa
    return out
