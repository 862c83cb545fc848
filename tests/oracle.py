"""Pure-Python secp256k1 oracle for differential testing.

Independent int-based implementation of the reference semantics
(BlockstreamResearch/secp256k1-zkp) used as the golden model for the TPU
library — the "bit-exactness oracle" of SURVEY.md §7.0.  Deliberately
simple and slow; correctness is cross-checked by the Wycheproof / BIP-340
vector tests.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

P = 2 ** 256 - 2 ** 32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
G = (GX, GY)

INF = None  # point at infinity


# -- EC ops (affine, Python ints) -------------------------------------------

def point_add(a, b):
    if a is INF:
        return b
    if b is INF:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return INF
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def point_neg(a):
    if a is INF:
        return INF
    return (a[0], (P - a[1]) % P)


def point_mul(k, pt):
    k %= N
    r = INF
    q = pt
    while k:
        if k & 1:
            r = point_add(r, q)
        q = point_add(q, q)
        k >>= 1
    return r


def is_on_curve(pt):
    if pt is INF:
        return True
    x, y = pt
    return (y * y - x * x * x - 7) % P == 0


def lift_x_even_y(x):
    """BIP-340 lift_x: point with given x and even y, or None."""
    if x >= P:
        return None
    y2 = (pow(x, 3, P) + 7) % P
    y = pow(y2, (P + 1) // 4, P)
    if y * y % P != y2:
        return None
    if y & 1:
        y = P - y
    return (x, y)


def decompress(prefix, x):
    y2 = (pow(x, 3, P) + 7) % P
    y = pow(y2, (P + 1) // 4, P)
    if y * y % P != y2:
        return None
    if (y & 1) != (prefix & 1):
        y = P - y
    return (x, y)


# -- hashes ------------------------------------------------------------------

def sha256(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


def tagged_hash(tag: str, msg: bytes) -> bytes:
    th = sha256(tag.encode())
    return sha256(th + th + msg)


def hmac_sha256(key: bytes, msg: bytes) -> bytes:
    return hmac_mod.new(key, msg, hashlib.sha256).digest()


def rfc6979_nonce(seckey32: bytes, msg32: bytes, algo16: bytes | None = None,
                  extra32: bytes | None = None, counter: int = 0) -> bytes:
    """RFC6979 HMAC-SHA256 DRBG as the reference wires it
    (nonce_function_rfc6979, src/secp256k1.c:519-560): key material is
    seckey||msg32[||extra32][||algo16]; returns the counter-th candidate."""
    keydata = seckey32 + msg32
    if extra32 is not None:
        keydata += extra32
    if algo16 is not None:
        keydata += algo16
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac_sha256(k, v + b"\x00" + keydata)
    v = hmac_sha256(k, v)
    k = hmac_sha256(k, v + b"\x01" + keydata)
    v = hmac_sha256(k, v)
    for _ in range(counter + 1):
        v = hmac_sha256(k, v)
        out = v
        # next-candidate step (only used if this candidate is rejected)
        k = hmac_sha256(k, v + b"\x00")
        v = hmac_sha256(k, v)
    return out


# -- ECDSA (low-S, RFC6979; matches ecdsa_sig_sign src/ecdsa_impl.h:274) -----

def ecdsa_sign(msg32: bytes, seckey: int, counter: int = 0):
    """Returns (r, s, recid)."""
    sec32 = seckey.to_bytes(32, "big")
    attempt = counter
    while True:
        k = int.from_bytes(rfc6979_nonce(sec32, msg32, counter=attempt),
                           "big")
        attempt += 1
        if k == 0 or k >= N:
            continue
        R = point_mul(k, G)
        r = R[0] % N
        if r == 0:
            continue
        overflow = R[0] >= N
        recid = (2 if overflow else 0) | (R[1] & 1)
        m = int.from_bytes(msg32, "big") % N
        s = pow(k, N - 2, N) * (m + r * seckey) % N
        if s == 0:
            continue
        if s > N // 2:
            s = N - s
            recid ^= 1
        return r, s, recid


def ecdsa_verify(msg32: bytes, pub, r: int, s: int) -> bool:
    if not (1 <= r < N and 1 <= s < N):
        return False
    if s > N // 2:  # low-S rule enforced like secp256k1_ecdsa_verify
        return False
    m = int.from_bytes(msg32, "big") % N
    sinv = pow(s, N - 2, N)
    u1 = m * sinv % N
    u2 = r * sinv % N
    R = point_add(point_mul(u1, G), point_mul(u2, pub))
    if R is INF:
        return False
    return R[0] % N == r


def ecdsa_recover(msg32: bytes, r: int, s: int, recid: int):
    x = r + N if (recid & 2) else r
    pt = decompress(recid & 1, x)
    if pt is None:
        return None
    m = int.from_bytes(msg32, "big") % N
    rinv = pow(r, N - 2, N)
    # Q = r^-1 (sR - mG)
    Q = point_add(point_mul(s * rinv % N, pt),
                  point_mul((N - m) * rinv % N, G))
    return Q


# -- BIP-340 Schnorr ----------------------------------------------------------

def schnorr_sign(msg: bytes, seckey: int, aux32: bytes = b"\x00" * 32):
    d = seckey
    Pt = point_mul(d, G)
    if Pt[1] & 1:
        d = N - d
    t = d ^ int.from_bytes(tagged_hash("BIP0340/aux", aux32), "big")
    rand = tagged_hash("BIP0340/nonce",
                       t.to_bytes(32, "big") + Pt[0].to_bytes(32, "big") + msg)
    k = int.from_bytes(rand, "big") % N
    assert k != 0
    R = point_mul(k, G)
    if R[1] & 1:
        k = N - k
    e = int.from_bytes(
        tagged_hash("BIP0340/challenge",
                    R[0].to_bytes(32, "big") + Pt[0].to_bytes(32, "big")
                    + msg), "big") % N
    s = (k + e * d) % N
    return R[0].to_bytes(32, "big") + s.to_bytes(32, "big")


def schnorr_verify(msg: bytes, pubx: int, sig64: bytes) -> bool:
    Pt = lift_x_even_y(pubx)
    if Pt is None:
        return False
    r = int.from_bytes(sig64[:32], "big")
    s = int.from_bytes(sig64[32:], "big")
    if r >= P or s >= N:
        return False
    e = int.from_bytes(
        tagged_hash("BIP0340/challenge",
                    sig64[:32] + pubx.to_bytes(32, "big") + msg), "big") % N
    R = point_add(point_mul(s, G), point_neg(point_mul(e, Pt)))
    if R is INF or (R[1] & 1) or R[0] != r:
        return False
    return True


# -- generators / Pedersen (zkp modules) --------------------------------------

_SVDW_C = pow(P - 3, (P + 1) // 4, P)
_SVDW_D = (_SVDW_C - 1) * pow(2, -1, P) % P


def svdw(t: int):
    """Shallue–van de Woestijne map, matching the reference's formulas and
    tie-breaking (modules/generator/main_impl.h:94-202)."""
    def sqrt_qr(a):
        r = pow(a, (P + 1) // 4, P)
        return r, r * r % P == a

    t2 = t * t % P
    wd = (1 + 7 + t2) % P
    x3d = (-3 * t2) % P
    j = wd * x3d % P
    jinv = pow(j, P - 2, P) if j else 0
    x1 = (_SVDW_D - _SVDW_C * t2 % P * x3d % P * jinv) % P
    x2 = (-(x1 + 1)) % P
    x3 = (1 + wd * wd % P * wd % P * jinv) % P
    y1, aq = sqrt_qr((x1 ** 3 + 7) % P)
    y2, bq = sqrt_qr((x2 ** 3 + 7) % P)
    y3, _ = sqrt_qr((x3 ** 3 + 7) % P)
    if aq:
        x, y = x1, y1
    elif bq:
        x, y = x2, y2
    else:
        x, y = x3, y3
    if t & 1:
        y = P - y
    return (x, y)


def generator_generate(key32: bytes, blind32: bytes | None = None):
    t1 = int.from_bytes(sha256(b"1st generation: " + key32), "big")
    t2 = int.from_bytes(sha256(b"2nd generation: " + key32), "big")
    if t1 >= P or t2 >= P:
        return None
    acc = point_add(svdw(t1), svdw(t2))
    if blind32 is not None:
        acc = point_add(acc, point_mul(int.from_bytes(blind32, "big"), G))
    return acc


def is_square_fe(a: int) -> bool:
    return a == 0 or pow(a, (P - 1) // 2, P) == 1


def generator_serialize(pt) -> bytes:
    return bytes([11 ^ is_square_fe(pt[1])]) + pt[0].to_bytes(32, "big")


def pedersen_commit(blind32: bytes, value: int, gen):
    b = int.from_bytes(blind32, "big")
    if b >= N:
        return None
    return point_add(point_mul(b, G), point_mul(value, gen))


def pedersen_commitment_serialize(pt) -> bytes:
    return bytes([9 ^ is_square_fe(pt[1])]) + pt[0].to_bytes(32, "big")


# -- ElligatorSwift (BIP-324) --------------------------------------------------

_ES_C0 = pow(P - 3, (P + 1) // 4, P)
_ES_C1 = (_ES_C0 - 1) * pow(2, -1, P) % P
_ES_C2 = (-_ES_C0 - 1) * pow(2, -1, P) % P
_ES_C3 = (P - _ES_C1) % P
_ES_C4 = (_ES_C1 + 1) % P


def _x_on_curve(x):
    return is_square_fe((pow(x, 3, P) + 7) % P)


def xswiftec(u, t):
    u = u % P or 1
    s = t * t % P or 1
    g = (pow(u, 3, P) + 7) % P
    if (g + s) % P == 0:
        s = 4 * s % P
    p_ = (g + s) % P
    d = 3 * s * u * u % P
    n = (d * u - p_ * p_) % P
    if d and is_square_fe((pow(n, 3, P) * d + 7 * pow(d, 4, P)) % P):
        return n * pow(d, -1, P) % P
    n2 = (_ES_C1 * s + _ES_C2 * g) % P * u % P
    if is_square_fe((pow(n2, 3, P) * p_ + 7 * pow(p_, 4, P)) % P):
        return n2 * pow(p_, -1, P) % P
    n1 = (-(n2 + p_ * u)) % P
    return n1 * pow(p_, -1, P) % P


def xswiftec_inv(x, u, c):
    """Returns t or None (mirrors xswiftec_inv_var semantics)."""
    if not (c & 2):
        if _x_on_curve((-x - u) % P):
            return None
        den = (-(u * u + u * x + x * x)) % P
        g = (pow(u, 3, P) + 7) % P
        if not is_square_fe(den * g % P):
            return None
        s = pow(den, -1, P) * g % P
        v = x
    else:
        s = (x - u) % P
        if not is_square_fe(s):
            return None
        q = (-s * (4 * (pow(u, 3, P) + 7) + 3 * u * u % P * s)) % P
        if not is_square_fe(q):
            return None
        r = pow(q, (P + 1) // 4, P)
        if (c & 1) and r == 0:
            return None
        if s == 0:
            return None
        v = (r * pow(s, -1, P) - u) % P * pow(2, -1, P) % P
    w = pow(s, (P + 1) // 4, P)
    if w * w % P != s:
        return None
    if (c & 5) == 0 or (c & 5) == 5:
        w = (P - w) % P
    cmul = _ES_C4 if (c & 1) else _ES_C3
    return w * ((cmul * u + v) % P) % P


def ellswift_decode(ell64: bytes):
    u = int.from_bytes(ell64[:32], "big") % P
    t = int.from_bytes(ell64[32:], "big") % P
    x = xswiftec(u, t)
    y = pow((pow(x, 3, P) + 7) % P, (P + 1) // 4, P)
    if (y & 1) != (t & 1):
        y = P - y
    return (x, y)


def _ellswift_prng(prefix: bytes, cnt: int) -> bytes:
    return sha256(prefix + cnt.to_bytes(4, "little"))


def ellswift_encode(pub, rnd32: bytes) -> bytes:
    """Mirrors ellswift_encode (tag secp256k1_ellswift_encode)."""
    th = sha256(b"secp256k1_ellswift_encode")
    ser33 = bytes([2 + (pub[1] & 1)]) + pub[0].to_bytes(32, "big")
    prefix = th + th + ser33 + b"\x00" * 31 + rnd32
    return _ellswift_search(pub, prefix)


def ellswift_create(sec: int, auxrnd32: bytes | None = None) -> bytes:
    th = sha256(b"secp256k1_ellswift_create")
    prefix = th + th + sec.to_bytes(32, "big") + b"\x00" * 32
    if auxrnd32 is not None:
        prefix += auxrnd32
    return _ellswift_search(point_mul(sec, G), prefix)


def _ellswift_search(pub, prefix: bytes) -> bytes:
    cnt = 0
    branches_left = 0
    pool = b""
    while True:
        if branches_left == 0:
            pool = _ellswift_prng(prefix, cnt)
            cnt += 1
            branches_left = 64
        branches_left -= 1
        branch = (pool[branches_left >> 1] >> ((branches_left & 1) << 2)) & 7
        u32 = _ellswift_prng(prefix, cnt)
        cnt += 1
        u = int.from_bytes(u32, "big") % P
        t = xswiftec_inv(pub[0], u, branch)
        if t is not None:
            if (t & 1) != (pub[1] & 1):
                t = P - t
            return u32 + t.to_bytes(32, "big")


def ellswift_xdh_bip324(ell_a: bytes, ell_b: bytes, sec: int,
                        party_a: bool) -> bytes:
    theirs = ell_b if party_a else ell_a
    pt = ellswift_decode(theirs)
    shared = point_mul(sec, pt)
    return tagged_hash("bip324_ellswift_xonly_ecdh",
                       ell_a + ell_b + shared[0].to_bytes(32, "big"))


# -- helpers for tests --------------------------------------------------------

def fe_limbs(x: int):
    return [(x >> (16 * i)) & 0xFFFF for i in range(16)]
