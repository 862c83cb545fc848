/* Batch strict-DER ECDSA signature codec (host data plane).
 *
 * Native counterpart of the reference's DER parser/serializer
 * (src/ecdsa_impl.h:36-194), batched: one call parses N signatures into
 * fixed (r32||s32) compact rows for device upload.  Same strictness as
 * utils/der.py (which is the pure-Python fallback): definite minimal
 * lengths, minimal positive INTEGERs, no trailing garbage; integers with
 * more than 32 magnitude bytes parse as zero (like
 * secp256k1_der_parse_integer clearing on overflow).
 *
 * Built as a plain shared library, driven via ctypes (no pybind11 in the
 * image).  Throughput target: >10M sigs/s/core so the host never gates
 * the device pipeline.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

/* returns new position or -1 */
static long parse_len(const uint8_t *d, long pos, long end, long *out_len) {
    if (pos >= end) return -1;
    uint8_t b = d[pos++];
    if (b < 0x80) { *out_len = b; return pos; }
    int n = b & 0x7F;
    if (n == 0) return -1;                   /* indefinite */
    if (pos + n > end || n > 4) return -1;
    if (d[pos] == 0) return -1;              /* non-minimal length */
    long val = 0;
    for (int i = 0; i < n; i++) val = (val << 8) | d[pos + i];
    if (val < 0x80) return -1;               /* could use short form */
    *out_len = val;
    return pos + n;
}

/* parse one INTEGER into out32 (big-endian, zero-padded); returns new pos
 * or -1 */
static long parse_int(const uint8_t *d, long pos, long end, uint8_t *out32) {
    if (pos >= end || d[pos] != 0x02) return -1;
    long ilen;
    pos = parse_len(d, pos + 1, end, &ilen);
    if (pos < 0 || ilen == 0 || pos + ilen > end) return -1;
    const uint8_t *body = d + pos;
    if (body[0] & 0x80) return -1;           /* negative */
    if (ilen > 1 && body[0] == 0 && !(body[1] & 0x80)) return -1;
    const uint8_t *mag = body;
    long mlen = ilen;
    if (mag[0] == 0) { mag++; mlen--; }
    memset(out32, 0, 32);
    if (mlen <= 32 && mlen > 0)
        memcpy(out32 + (32 - mlen), mag, mlen);
    /* mlen > 32: overflow -> leave zero (matches reference semantics) */
    return pos + ilen;
}

/* data: concatenated DER sigs; offsets[i], lengths[i] per signature.
 * out_rs: n rows of 64 bytes (r32||s32). ok[i] in {0,1}. */
void secp_tpu_der_parse_batch(const uint8_t *data, const int64_t *offsets,
                              const int64_t *lengths, int64_t n,
                              uint8_t *out_rs, uint8_t *ok) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t *sig = data + offsets[i];
        long end = lengths[i];
        uint8_t *row = out_rs + 64 * i;
        ok[i] = 0;
        memset(row, 0, 64);
        if (end < 1 || sig[0] != 0x30) continue;
        long seqlen;
        long pos = parse_len(sig, 1, end, &seqlen);
        if (pos < 0 || pos + seqlen != end) continue;
        pos = parse_int(sig, pos, end, row);
        if (pos < 0) continue;
        pos = parse_int(sig, pos, end, row + 32);
        if (pos < 0 || pos != end) continue;
        ok[i] = 1;
    }
}

/* rs: n rows of 64 bytes. out: n rows of 72 bytes (max DER size);
 * out_lens[i] = actual length. */
void secp_tpu_der_serialize_batch(const uint8_t *rs, int64_t n,
                                  uint8_t *out, int64_t *out_lens) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t *r = rs + 64 * i;
        const uint8_t *s = r + 32;
        uint8_t *o = out + 72 * i;
        uint8_t body[70];
        long blen = 0;
        for (int half = 0; half < 2; half++) {
            const uint8_t *v = half ? s : r;
            int lead = 0;
            while (lead < 31 && v[lead] == 0) lead++;
            int mlen = 32 - lead;
            int pad = (v[lead] & 0x80) ? 1 : 0;
            body[blen++] = 0x02;
            body[blen++] = (uint8_t)(mlen + pad);
            if (pad) body[blen++] = 0;
            memcpy(body + blen, v + lead, mlen);
            blen += mlen;
        }
        o[0] = 0x30;
        o[1] = (uint8_t)blen;
        memcpy(o + 2, body, blen);
        out_lens[i] = blen + 2;
    }
}
