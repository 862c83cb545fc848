"""secp256k1_zkp_tpu — a TPU-native secp256k1-zkp primitive library.

Brand-new JAX/Pallas implementation with the capabilities of
BlockstreamResearch/secp256k1-zkp (see SURVEY.md); batched-first API,
sharded multi-scalar multiplication, and bit-exact parity with the
reference's test vectors.

Layer map (mirrors SURVEY.md §1, redesigned for TPU):

=====================  =====================================================
``ops.limb``           batched base-2^16 modular bignum engine (ref L0/L1)
``ops.field``          GF(p) instance                     (src/field*.h)
``ops.scalar``         GF(n) instance                     (src/scalar*.h)
``ops.group``          branch-free gej/ge point ops       (src/group*.h)
``ops.ecmult``         k*G / k*P / u1*G+u2*P engines      (src/ecmult*.h)
``ops.msm``            multi-scalar multiplication        (ecmult_impl.h:823)
``ops.sha256``         SHA256/HMAC/RFC6979/tagged/stream  (src/hash*.h)
``parallel``           device mesh + sharded MSM          (no ref analog)
``context``            device table state                 (secp256k1.c:82)
=====================  =====================================================

Module inventory (each mirrors a reference module, SURVEY.md §2.2):

=========================  ==================================================
``modules.ecdsa``          ECDSA sign/verify/recover + RFC6979
``modules.recovery``       recoverable-signature API       (secp256k1_recovery.h)
``modules.eckey``          pubkey codec / tweaks           (secp256k1.h EC API)
``modules.ecdh``           X9.63 ECDH                      (secp256k1_ecdh.h)
``modules.extrakeys``      x-only keys / keypairs          (secp256k1_extrakeys.h)
``modules.schnorrsig``     BIP-340                         (secp256k1_schnorrsig.h)
``modules.musig``          MuSig2 / BIP-327                (secp256k1_musig.h)
``modules.ellswift``       ElligatorSwift / BIP-324        (secp256k1_ellswift.h)
``modules.halfagg``        Schnorr half-aggregation        (…_schnorrsig_halfagg.h)
``modules.generator``      NUMS generators + Pedersen      (secp256k1_generator.h)
``modules.rangeproof``     Back–Maxwell range proofs       (secp256k1_rangeproof.h)
``modules.borromean``      Borromean ring signatures       (rangeproof/borromean.h)
``modules.surjection``     asset surjection proofs         (…_surjectionproof.h)
``modules.whitelist``      whitelist ring signatures       (secp256k1_whitelist.h)
``modules.ecdsa_s2c``      sign-to-contract / anti-exfil   (secp256k1_ecdsa_s2c.h)
``modules.ecdsa_adaptor``  ECDSA adaptor sigs + DLEQ       (secp256k1_ecdsa_adaptor.h)
``modules.bppp``           Bulletproofs++ norm argument    (secp256k1_bppp.h)
=========================  ==================================================
"""

__version__ = "0.1.0"

from . import context as context  # noqa: F401
from .context import Context, default_context  # noqa: F401


def __getattr__(name):
    # Lazy subpackage access: `import secp256k1_zkp_tpu as z; z.modules.ecdsa`
    import importlib
    if name in ("ops", "modules", "parallel", "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
