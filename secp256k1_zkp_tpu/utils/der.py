"""Strict DER signature codec (host-side).

Counterpart of the reference's DER parser/serializer
(src/ecdsa_impl.h:36-194).  Variable-length byte wrangling stays on the
host (SURVEY.md §7.2.4 host/device seam); devices only ever see compact
(r32||s32) signatures.

Matches the reference's strictness: definite minimal lengths, minimal
positive INTEGERs, no trailing garbage.  Integer overflow (> 32 bytes of
magnitude) parses successfully but yields r/s = 0, exactly like
secp256k1_der_parse_integer clearing the scalar on overflow — which then
fails verification.
"""

from __future__ import annotations


def _parse_len(data: bytes, pos: int):
    """Returns (length, new_pos) or None on invalid encoding."""
    if pos >= len(data):
        return None
    b = data[pos]
    pos += 1
    if b < 0x80:
        return b, pos
    n = b & 0x7F
    if n == 0:  # 0x80: indefinite length — forbidden in DER
        return None
    if pos + n > len(data):
        return None
    if data[pos] == 0:  # leading zero length byte: non-minimal
        return None
    val = int.from_bytes(data[pos:pos + n], "big")
    if val < 0x80:  # could have used short form
        return None
    return val, pos + n


def _parse_int(data: bytes, pos: int):
    """Returns (value_or_0_on_overflow, new_pos) or None."""
    if pos >= len(data) or data[pos] != 0x02:
        return None
    r = _parse_len(data, pos + 1)
    if r is None:
        return None
    ilen, pos = r
    if ilen == 0 or pos + ilen > len(data):
        return None
    body = data[pos:pos + ilen]
    if body[0] & 0x80:  # negative
        return None
    if ilen > 1 and body[0] == 0 and not (body[1] & 0x80):
        return None  # excessive padding
    # strip the single allowed leading zero
    mag = body[1:] if body[0] == 0 else body
    val = int.from_bytes(mag, "big") if len(mag) <= 32 else 0  # overflow->0
    return val, pos + ilen


def sig_der_parse(sig: bytes):
    """DER -> (r, s) ints, or None if malformed."""
    r = _parse_len(sig, 1) if len(sig) >= 1 and sig[0] == 0x30 else None
    if r is None:
        return None
    seqlen, pos = r
    if pos + seqlen != len(sig):
        return None  # trailing garbage or truncation
    ri = _parse_int(sig, pos)
    if ri is None:
        return None
    rv, pos = ri
    si = _parse_int(sig, pos)
    if si is None:
        return None
    sv, pos = si
    if pos != len(sig):
        return None
    return rv, sv


def _encode_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return bytes([0x02, len(b)]) + b


def sig_der_serialize(r: int, s: int) -> bytes:
    """(r, s) -> DER (cf. ecdsa_sig_serialize, src/ecdsa_impl.h:171)."""
    body = _encode_int(r) + _encode_int(s)
    assert len(body) < 0x80
    return bytes([0x30, len(body)]) + body
