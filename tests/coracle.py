"""ctypes bindings to the *reference* C library, used purely as a test
oracle (SURVEY.md §7.0 "bit-exactness oracle").

Builds BlockstreamResearch/secp256k1-zkp out-of-tree (all modules on)
into ~/.cache and drives it for differential tests of the zkp modules
(pedersen/rangeproof/surjection/whitelist/s2c/adaptor).  Tests skip if
the reference or a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

REF = "/root/reference"
CACHE = os.path.expanduser("~/.cache/secp_ref_build")
SO = os.path.join(CACHE, "lib", "libsecp256k1.so")

_lib = None


def _build():
    if os.path.exists(SO):
        return True
    if not os.path.exists(REF):
        return False
    os.makedirs(CACHE, exist_ok=True)
    mods = ["RECOVERY", "GENERATOR", "RANGEPROOF", "SURJECTIONPROOF",
            "WHITELIST", "MUSIG", "ECDSA_S2C", "ECDSA_ADAPTOR",
            "SCHNORRSIG_HALFAGG", "BPPP"]
    flags = [f"-DSECP256K1_ENABLE_MODULE_{m}=ON" for m in mods]
    try:
        subprocess.run(
            ["cmake", REF, "-DCMAKE_BUILD_TYPE=Release",
             "-DSECP256K1_EXPERIMENTAL=ON", "-DSECP256K1_BUILD_TESTS=OFF",
             "-DSECP256K1_BUILD_BENCHMARK=OFF",
             "-DSECP256K1_BUILD_EXHAUSTIVE_TESTS=OFF"] + flags,
            cwd=CACHE, check=True, capture_output=True, timeout=300)
        subprocess.run(["make", "-j4"], cwd=CACHE, check=True,
                       capture_output=True, timeout=600)
        return os.path.exists(SO)
    except Exception:
        return False


def available() -> bool:
    global _lib
    if _lib is not None:
        return True
    if not _build():
        return False
    try:
        _lib = ctypes.CDLL(SO)
        return True
    except OSError:
        return False


class Ref:
    """Thin wrapper; create one per test module."""

    def __init__(self):
        assert available()
        self.lib = ctypes.CDLL(SO)
        self.lib.secp256k1_context_create.restype = ctypes.c_void_p
        self.ctx = ctypes.c_void_p(
            self.lib.secp256k1_context_create(0x0301 | 0x0100))
        # SECP256K1_CONTEXT_SIGN|VERIFY legacy flags: use 0x0301|0x0101?
        # modern lib: CONTEXT_NONE works for all but keeps ecmult_gen —
        # pass SECP256K1_CONTEXT_SIGN|VERIFY = (1|(1<<0)...): simplest is
        # SECP256K1_CONTEXT_SIGN = 0x0201? use both legacy values:
        if not self.ctx:
            self.ctx = ctypes.c_void_p(
                self.lib.secp256k1_context_create(1))

    # -- generator / pedersen -------------------------------------------
    def generator_generate(self, key32: bytes) -> bytes | None:
        gen = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_generator_generate(self.ctx, gen, key32)
        if not r:
            return None
        out = ctypes.create_string_buffer(33)
        self.lib.secp256k1_generator_serialize(self.ctx, out, gen)
        return out.raw

    def generator_import(self, ser33: bytes):
        gen = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_generator_parse(self.ctx, gen, ser33)
        return gen if r else None

    def pedersen_commit(self, blind32: bytes, value: int,
                        gen_ser33: bytes) -> bytes | None:
        gen = self.generator_import(gen_ser33)
        if gen is None:
            return None
        commit = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_pedersen_commit(
            self.ctx, commit, blind32, ctypes.c_uint64(value), gen)
        if not r:
            return None
        out = ctypes.create_string_buffer(33)
        self.lib.secp256k1_pedersen_commitment_serialize(self.ctx, out,
                                                         commit)
        return out.raw

    def _commit_obj(self, commit_ser33: bytes):
        c = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_pedersen_commitment_parse(self.ctx, c,
                                                         commit_ser33)
        return c if r else None

    # -- rangeproof -------------------------------------------------------
    def rangeproof_sign(self, min_value: int, commit_ser33: bytes,
                        blind32: bytes, nonce32: bytes, exp: int,
                        min_bits: int, value: int, gen_ser33: bytes,
                        message: bytes = b"",
                        extra: bytes = b"") -> bytes | None:
        commit = self._commit_obj(commit_ser33)
        gen = self.generator_import(gen_ser33)
        if commit is None or gen is None:
            return None
        proof = ctypes.create_string_buffer(5134)
        plen = ctypes.c_size_t(5134)
        r = self.lib.secp256k1_rangeproof_sign(
            self.ctx, proof, ctypes.byref(plen),
            ctypes.c_uint64(min_value), commit, blind32, nonce32,
            ctypes.c_int(exp), ctypes.c_int(min_bits),
            ctypes.c_uint64(value),
            message if message else None, ctypes.c_size_t(len(message)),
            extra if extra else None, ctypes.c_size_t(len(extra)), gen)
        if not r:
            return None
        return proof.raw[:plen.value]

    def rangeproof_verify(self, commit_ser33: bytes, proof: bytes,
                          gen_ser33: bytes, extra: bytes = b"") -> bool:
        commit = self._commit_obj(commit_ser33)
        gen = self.generator_import(gen_ser33)
        if commit is None or gen is None:
            return False
        mn = ctypes.c_uint64()
        mx = ctypes.c_uint64()
        return bool(self.lib.secp256k1_rangeproof_verify(
            self.ctx, ctypes.byref(mn), ctypes.byref(mx), commit,
            proof, ctypes.c_size_t(len(proof)),
            extra if extra else None, ctypes.c_size_t(len(extra)), gen))

    # -- ecdsa s2c / anti-exfil -----------------------------------------
    def ecdsa_s2c_sign(self, msg32: bytes, sec32: bytes,
                       data32: bytes):
        """Returns (sig64 compact, opening33) or None."""
        sig = ctypes.create_string_buffer(64)
        opening = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_ecdsa_s2c_sign(self.ctx, sig, opening,
                                              msg32, sec32, data32)
        if not r:
            return None
        out = ctypes.create_string_buffer(64)
        self.lib.secp256k1_ecdsa_signature_serialize_compact(
            self.ctx, out, sig)
        op33 = ctypes.create_string_buffer(33)
        self.lib.secp256k1_ecdsa_s2c_opening_serialize(self.ctx, op33,
                                                       opening)
        return out.raw, op33.raw

    def ecdsa_s2c_verify_commit(self, sig64: bytes, data32: bytes,
                                opening33: bytes) -> bool:
        sig = ctypes.create_string_buffer(64)
        self.lib.secp256k1_ecdsa_signature_parse_compact(self.ctx, sig,
                                                         sig64)
        op = ctypes.create_string_buffer(64)
        if not self.lib.secp256k1_ecdsa_s2c_opening_parse(self.ctx, op,
                                                          opening33):
            return False
        return bool(self.lib.secp256k1_ecdsa_s2c_verify_commit(
            self.ctx, sig, data32, op))

    # -- ecdsa adaptor ----------------------------------------------------
    def _pubkey_obj(self, ser: bytes):
        pk = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_ec_pubkey_parse(
            self.ctx, pk, ser, ctypes.c_size_t(len(ser)))
        return pk if r else None

    def adaptor_encrypt(self, sec32: bytes, enckey_ser: bytes,
                        msg32: bytes):
        pk = self._pubkey_obj(enckey_ser)
        if pk is None:
            return None
        sig = ctypes.create_string_buffer(162)
        r = self.lib.secp256k1_ecdsa_adaptor_encrypt(
            self.ctx, sig, sec32, pk, msg32, None, None)
        return sig.raw if r else None

    def adaptor_verify(self, adaptor162: bytes, pub_ser: bytes,
                       msg32: bytes, enckey_ser: bytes) -> bool:
        pk = self._pubkey_obj(pub_ser)
        ek = self._pubkey_obj(enckey_ser)
        if pk is None or ek is None:
            return False
        return bool(self.lib.secp256k1_ecdsa_adaptor_verify(
            self.ctx, adaptor162, pk, msg32, ek))

    def adaptor_decrypt(self, deckey32: bytes, adaptor162: bytes):
        sig = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_ecdsa_adaptor_decrypt(self.ctx, sig,
                                                     deckey32,
                                                     adaptor162)
        if not r:
            return None
        out = ctypes.create_string_buffer(64)
        self.lib.secp256k1_ecdsa_signature_serialize_compact(self.ctx,
                                                             out, sig)
        return out.raw

    def adaptor_recover(self, sig64: bytes, adaptor162: bytes,
                        enckey_ser: bytes):
        sig = ctypes.create_string_buffer(64)
        self.lib.secp256k1_ecdsa_signature_parse_compact(self.ctx, sig,
                                                         sig64)
        ek = self._pubkey_obj(enckey_ser)
        if ek is None:
            return None
        dk = ctypes.create_string_buffer(32)
        r = self.lib.secp256k1_ecdsa_adaptor_recover(self.ctx, dk, sig,
                                                     adaptor162, ek)
        return dk.raw if r else None

    # -- surjection proofs ------------------------------------------------
    # struct secp256k1_surjectionproof: size_t n_inputs + used_inputs
    # bitmap (32) + data 32*(1+MAX_USED) (include/secp256k1_surjectionproof.h:40)
    _SURJ_STRUCT = 8 + 32 + 32 * 257

    def generator_generate_blinded(self, key32: bytes,
                                   blind32: bytes) -> bytes | None:
        gen = ctypes.create_string_buffer(64)
        r = self.lib.secp256k1_generator_generate_blinded(
            self.ctx, gen, key32, blind32)
        if not r:
            return None
        out = ctypes.create_string_buffer(33)
        self.lib.secp256k1_generator_serialize(self.ctx, out, gen)
        return out.raw

    def surjection_initialize(self, fixed_tags: list[bytes], n_use: int,
                              fixed_out: bytes, n_max_iter: int,
                              seed32: bytes):
        """Returns (proof_struct, input_index, n_iters) or None."""
        proof = ctypes.create_string_buffer(self._SURJ_STRUCT)
        idx = ctypes.c_size_t()
        tags = b"".join(fixed_tags)
        r = self.lib.secp256k1_surjectionproof_initialize(
            self.ctx, proof, ctypes.byref(idx), tags,
            ctypes.c_size_t(len(fixed_tags)), ctypes.c_size_t(n_use),
            fixed_out, ctypes.c_size_t(n_max_iter), seed32)
        if not r:
            return None
        return proof, idx.value, r

    def surjection_generate(self, proof, input_gens33: list[bytes],
                            output_gen33: bytes, input_index: int,
                            input_blind32: bytes, output_blind32: bytes):
        gens = b"".join(
            self.generator_import(g).raw for g in input_gens33)
        out_gen = self.generator_import(output_gen33)
        r = self.lib.secp256k1_surjectionproof_generate(
            self.ctx, proof, gens, ctypes.c_size_t(len(input_gens33)),
            out_gen, ctypes.c_size_t(input_index), input_blind32,
            output_blind32)
        return bool(r)

    def surjection_verify(self, proof, input_gens33: list[bytes],
                          output_gen33: bytes) -> bool:
        gens = b"".join(
            self.generator_import(g).raw for g in input_gens33)
        out_gen = self.generator_import(output_gen33)
        return bool(self.lib.secp256k1_surjectionproof_verify(
            self.ctx, proof, gens, ctypes.c_size_t(len(input_gens33)),
            out_gen))

    def surjection_serialize(self, proof) -> bytes:
        out = ctypes.create_string_buffer(2 + 32 + 32 * 257)
        olen = ctypes.c_size_t(2 + 32 + 32 * 257)
        r = self.lib.secp256k1_surjectionproof_serialize(
            self.ctx, out, ctypes.byref(olen), proof)
        assert r
        return out.raw[:olen.value]

    def surjection_parse(self, data: bytes):
        proof = ctypes.create_string_buffer(self._SURJ_STRUCT)
        r = self.lib.secp256k1_surjectionproof_parse(
            self.ctx, proof, data, ctypes.c_size_t(len(data)))
        return proof if r else None

    # -- whitelist ---------------------------------------------------------
    # struct secp256k1_whitelist_signature: size_t n_keys + data
    # 32*(1+MAX_KEYS) (include/secp256k1_whitelist.h:34)
    _WL_STRUCT = 8 + 32 * 257

    def whitelist_sign(self, online_pubs: list[bytes],
                       offline_pubs: list[bytes], sub_pub: bytes,
                       online_sec32: bytes, summed_sec32: bytes,
                       index: int):
        """pubs are serialized (33/65B); returns serialized sig or None."""
        n = len(online_pubs)
        on = b"".join(self._pubkey_obj(p).raw for p in online_pubs)
        off = b"".join(self._pubkey_obj(p).raw for p in offline_pubs)
        sub = self._pubkey_obj(sub_pub)
        sig = ctypes.create_string_buffer(self._WL_STRUCT)
        r = self.lib.secp256k1_whitelist_sign(
            self.ctx, sig, on, off, ctypes.c_size_t(n), sub,
            online_sec32, summed_sec32, ctypes.c_size_t(index))
        if not r:
            return None
        out = ctypes.create_string_buffer(1 + 32 * 257)
        olen = ctypes.c_size_t(1 + 32 * 257)
        r = self.lib.secp256k1_whitelist_signature_serialize(
            self.ctx, out, ctypes.byref(olen), sig)
        assert r
        return out.raw[:olen.value]

    def whitelist_verify(self, sig_ser: bytes, online_pubs: list[bytes],
                         offline_pubs: list[bytes],
                         sub_pub: bytes) -> bool:
        sig = ctypes.create_string_buffer(self._WL_STRUCT)
        if not self.lib.secp256k1_whitelist_signature_parse(
                self.ctx, sig, sig_ser, ctypes.c_size_t(len(sig_ser))):
            return False
        n = len(online_pubs)
        on = b"".join(self._pubkey_obj(p).raw for p in online_pubs)
        off = b"".join(self._pubkey_obj(p).raw for p in offline_pubs)
        sub = self._pubkey_obj(sub_pub)
        return bool(self.lib.secp256k1_whitelist_verify(
            self.ctx, sig, on, off, ctypes.c_size_t(n), sub))

    def rangeproof_rewind(self, blind_out_expected: bool,
                          commit_ser33: bytes, proof: bytes,
                          nonce32: bytes, gen_ser33: bytes,
                          extra: bytes = b""):
        commit = self._commit_obj(commit_ser33)
        gen = self.generator_import(gen_ser33)
        if commit is None or gen is None:
            return None
        blind = ctypes.create_string_buffer(32)
        value = ctypes.c_uint64()
        msg = ctypes.create_string_buffer(4096)
        mlen = ctypes.c_size_t(4096)
        mn = ctypes.c_uint64()
        mx = ctypes.c_uint64()
        r = self.lib.secp256k1_rangeproof_rewind(
            self.ctx, blind, ctypes.byref(value), msg, ctypes.byref(mlen),
            nonce32, ctypes.byref(mn), ctypes.byref(mx), commit,
            proof, ctypes.c_size_t(len(proof)),
            extra if extra else None, ctypes.c_size_t(len(extra)), gen)
        if not r:
            return None
        return (blind.raw, value.value, msg.raw[:mlen.value],
                mn.value, mx.value)
