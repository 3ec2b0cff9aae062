// Reference-truth oracle: compiles the upstream reference's own PRN code
// generators (from the read-only mount, nothing copied) and dumps chip
// levels so the Python generators can be validated against independent
// truth (VERDICT round-1: "validate against non-self-generated truth").
//
// Usage: oracle_codes <family> <prn>   -> prints chips as +-1 integers.
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <array>
#include <cstring>
#include <vector>

#include "beidou_b1i_signal_replica.h"
#include "beidou_b3i_signal_replica.h"
#include "gps_sdr_signal_replica.h"
#include "gps_l2c_signal_replica.h"
#include "gps_l5_signal_replica.h"
#include "galileo_e5_signal_replica.h"
#include "glonass_l1_signal_replica.h"
#include "qzss_signal_replica.h"

// tiny dependency of galileo_e5_signal_replica (declared in
// gnss_signal_replica.h whose .cc pulls in GNU Radio): hex digit -> four
// chip signs, bit 1 -> -1
void hex_to_binary_converter(own::span<int32_t> dest, char from)
{
    int v = (from >= 'A') ? (from - 'A' + 10)
                          : ((from >= 'a') ? (from - 'a' + 10) : (from - '0'));
    for (int b = 0; b < 4; b++)
        {
            dest[b] = ((v >> (3 - b)) & 1) ? -1 : 1;
        }
}

// unused sampled-code path dependency; the oracle only emits 1-sample/chip
void resampler(own::span<const std::complex<float>>,
    own::span<std::complex<float>>, float, float)
{
}

int main(int argc, char **argv)
{
    if (argc < 3)
        {
            std::fprintf(stderr, "usage: %s <b1i|gpsca|l5i|l5q|e5ai|e5aq> <prn>\n", argv[0]);
            return 2;
        }
    const char *fam = argv[1];
    const int prn = std::atoi(argv[2]);

    if (!std::strcmp(fam, "b1i"))
        {
            std::vector<int32_t> chips(2046);
            beidou_b1i_code_gen_int(own::span<int32_t>(chips.data(), chips.size()), prn, 0);
            for (auto c : chips) std::printf("%d\n", c);
        }
    else if (!std::strcmp(fam, "gpsca"))
        {
            std::vector<int32_t> chips(1023);
            gps_l1_ca_code_gen_int(own::span<int32_t>(chips.data(), chips.size()), prn, 0);
            for (auto c : chips) std::printf("%d\n", c);
        }
    else if (!std::strcmp(fam, "l5i") || !std::strcmp(fam, "l5q"))
        {
            std::vector<std::complex<float>> chips(10230);
            if (!std::strcmp(fam, "l5i"))
                gps_l5i_code_gen_complex(own::span<std::complex<float>>(chips.data(), chips.size()), prn);
            else
                gps_l5q_code_gen_complex(own::span<std::complex<float>>(chips.data(), chips.size()), prn);
            for (auto c : chips)
                std::printf("%d %d\n", static_cast<int>(c.real()), static_cast<int>(c.imag()));
        }
    else if (!std::strcmp(fam, "e5ai") || !std::strcmp(fam, "e5aq"))
        {
            // E5a component codes: the reference generates the full E5
            // complex baseband; the component primary codes come from
            // make_e5a_i/q tables inside galileo_e5_signal_replica
            std::vector<std::complex<float>> chips(10230);
            std::array<char, 3> sig = {'5', fam[3] == 'i' ? 'I' : 'Q', '\0'};
            galileo_e5_a_code_gen_complex_primary(
                own::span<std::complex<float>>(chips.data(), chips.size()), prn, sig);
            for (auto c : chips)
                std::printf("%d %d\n", static_cast<int>(c.real()), static_cast<int>(c.imag()));
        }
    else if (!std::strcmp(fam, "b3i"))
        {
            std::vector<int32_t> chips(10230);
            beidou_b3i_code_gen_int(own::span<int>(chips.data(), chips.size()), prn, 0);
            for (auto c : chips) std::printf("%d\n", c);
        }
    else if (!std::strcmp(fam, "l2cm"))
        {
            std::vector<float> chips(10230);
            gps_l2c_m_code_gen_float(own::span<float>(chips.data(), chips.size()), prn);
            for (auto c : chips) std::printf("%d\n", static_cast<int>(c));
        }
    else if (!std::strcmp(fam, "e5bi") || !std::strcmp(fam, "e5bq"))
        {
            std::vector<std::complex<float>> chips(10230);
            std::array<char, 3> sig = {'7', fam[3] == 'i' ? 'I' : 'Q', '\0'};
            galileo_e5_b_code_gen_complex_primary(
                own::span<std::complex<float>>(chips.data(), chips.size()), prn, sig);
            for (auto c : chips)
                std::printf("%d %d\n", static_cast<int>(c.real()), static_cast<int>(c.imag()));
        }
    else if (!std::strcmp(fam, "qzssl1"))
        {
            std::vector<float> chips(1023);
            qzss_l1_code_gen_float(own::span<float>(chips.data(), chips.size()), prn);
            for (auto c : chips) std::printf("%d\n", static_cast<int>(c));
        }
    else if (!std::strcmp(fam, "qzssl5i") || !std::strcmp(fam, "qzssl5q"))
        {
            std::vector<float> chips(10230);
            if (!std::strcmp(fam, "qzssl5i"))
                qzss_l5i_code_gen_float(own::span<float>(chips.data(), chips.size()), prn);
            else
                qzss_l5q_code_gen_float(own::span<float>(chips.data(), chips.size()), prn);
            for (auto c : chips) std::printf("%d\n", static_cast<int>(c));
        }
    else if (!std::strcmp(fam, "gloca"))
        {
            // one shared m-sequence for all satellites (FDMA); prn ignored
            std::vector<std::complex<float>> chips(511);
            glonass_l1_ca_code_gen_complex(
                own::span<std::complex<float>>(chips.data(), chips.size()), 0);
            for (auto c : chips) std::printf("%d\n", static_cast<int>(c.real()));
        }
    else
        {
            std::fprintf(stderr, "unknown family %s\n", fam);
            return 2;
        }
    return 0;
}
