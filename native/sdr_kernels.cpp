// Native host-side kernels for gnss_sdr_tpu.
//
// The reference implements its host hot loops in C (volk_gnsssdr SIMD
// kernels, libswiftcnav's viterbi27) — these are the TPU build's native
// equivalents for the paths that stay on the host CPU: packed-capture
// bit unpacking (signal_source/gnuradio_blocks/unpack_*_samples.cc) and
// the rate-1/2 K=7 Viterbi used by every FEC-coded telemetry stream
// (telemetry_decoder/libs/viterbi_decoder.cc, libswiftcnav/viterbi27.c).
//
// Built as a plain shared library, loaded via ctypes
// (gnss_sdr_tpu/native/__init__.py); no pybind11 dependency.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- unpack
// 4x 2-bit two's-complement fields per byte, LSB-first.
void unpack_2bit(const uint8_t* in, int8_t* out, int64_t n_bytes)
{
    static int8_t lut[256][4];
    static bool init = false;
    if (!init) {
        for (int b = 0; b < 256; b++) {
            for (int k = 0; k < 4; k++) {
                int v = (b >> (2 * k)) & 0x3;
                lut[b][k] = static_cast<int8_t>(v >= 2 ? v - 4 : v);
            }
        }
        init = true;
    }
    for (int64_t i = 0; i < n_bytes; i++) {
        std::memcpy(out + 4 * i, lut[in[i]], 4);
    }
}

// 2x 4-bit two's-complement fields per byte, LSB-first.
void unpack_4bit(const uint8_t* in, int8_t* out, int64_t n_bytes)
{
    static int8_t lut[256][2];
    static bool init = false;
    if (!init) {
        for (int b = 0; b < 256; b++) {
            for (int k = 0; k < 2; k++) {
                int v = (b >> (4 * k)) & 0xF;
                lut[b][k] = static_cast<int8_t>(v >= 8 ? v - 16 : v);
            }
        }
        init = true;
    }
    for (int64_t i = 0; i < n_bytes; i++) {
        out[2 * i] = lut[in[i]][0];
        out[2 * i + 1] = lut[in[i]][1];
    }
}

// --------------------------------------------------------------- viterbi
// Rate-1/2 K=7, polynomials G1=0o171, G2=0o133, register convention of
// gnss_sdr_tpu/telemetry/fec.py: 7-bit word = (input << 6) | state,
// next_state = word >> 1 (i.e. (input << 5) | (state >> 1)).
// symbols: [2n] soft values, +1 <=> bit 0; invert_g2 flips branch G2.
// start_state / end_state: 0..63, or -1 for free.
static inline int parity7(int x)
{
    x &= 0x7F;
    x ^= x >> 4;
    x ^= x >> 2;
    x ^= x >> 1;
    return x & 1;
}

void viterbi27(const double* symbols, int64_t n, int invert_g2,
               int start_state, int end_state, uint8_t* out_bits)
{
    constexpr int NS = 64;
    constexpr int G1 = 0171, G2 = 0133;
    double eg1[NS][2], eg2[NS][2];
    int nxt[NS][2];
    for (int s = 0; s < NS; s++) {
        for (int b = 0; b < 2; b++) {
            int word = (b << 6) | s;
            eg1[s][b] = parity7(word & G1) ? -1.0 : 1.0;
            int g2v = parity7(word & G2) ^ (invert_g2 ? 1 : 0);
            eg2[s][b] = g2v ? -1.0 : 1.0;
            nxt[s][b] = (b << 5) | (s >> 1);
        }
    }
    std::vector<double> metric(NS, -1e18), newm(NS);
    if (start_state < 0) {
        std::fill(metric.begin(), metric.end(), 0.0);
    } else {
        metric[start_state & 63] = 0.0;
    }
    // backpointers: per step, per state, (prev_state, bit)
    std::vector<uint8_t> prev(n * NS), bit(n * NS);
    for (int64_t k = 0; k < n; k++) {
        const double s0 = symbols[2 * k], s1 = symbols[2 * k + 1];
        std::fill(newm.begin(), newm.end(), -1e18);
        uint8_t* pk = prev.data() + k * NS;
        uint8_t* bk = bit.data() + k * NS;
        for (int s = 0; s < NS; s++) {
            const double m = metric[s];
            if (m < -1e17) continue;
            for (int b = 0; b < 2; b++) {
                const double cand = m + eg1[s][b] * s0 + eg2[s][b] * s1;
                const int t = nxt[s][b];
                if (cand > newm[t]) {
                    newm[t] = cand;
                    pk[t] = static_cast<uint8_t>(s);
                    bk[t] = static_cast<uint8_t>(b);
                }
            }
        }
        metric.swap(newm);
    }
    int s = 0;
    if (end_state < 0) {
        double best = -1e18;
        for (int t = 0; t < NS; t++) {
            if (metric[t] > best) { best = metric[t]; s = t; }
        }
    } else {
        s = end_state & 63;
    }
    for (int64_t k = n - 1; k >= 0; k--) {
        out_bits[k] = bit[k * NS + s];
        s = prev[k * NS + s];
    }
}

}  // extern "C"
