/* Reference C/VOLK correlator baseline timing.
 *
 * Compiles the reference's own kernel
 * volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn (carrier rotate + N-tap
 * real-code dot product, the hot inner loop of dll_pll_veml_tracking via
 * Cpu_Multicorrelator_Real_Codes) straight from the read-only upstream
 * mount and times the best available variant (AVX if compiled in, else
 * generic) on this machine. Produces the denominator for BASELINE.md's
 * ">= 10x the reference C++/VOLK baseline per chip" target.
 *
 * Build (see bench_volk/build.sh): the kernel header is included from
 * /root/reference -- nothing is copied into this repo.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include <volk_gnsssdr/volk_gnsssdr_complex.h>

#include VOLK_KERNEL_HEADER

static double now_s(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv)
{
    const unsigned int num_points = argc > 1 ? (unsigned)atoi(argv[1]) : 2600;
    const int num_taps = argc > 2 ? atoi(argv[2]) : 3;
    const int iters = argc > 3 ? atoi(argv[3]) : 20000;

    lv_32fc_t *in = malloc(num_points * sizeof(lv_32fc_t));
    float **taps = malloc(num_taps * sizeof(float *));
    lv_32fc_t *result = malloc(num_taps * sizeof(lv_32fc_t));
    for (int t = 0; t < num_taps; t++) {
        taps[t] = malloc(num_points * sizeof(float));
        for (unsigned i = 0; i < num_points; i++)
            taps[t][i] = ((i * 1103515245u + t) >> 16 & 1) ? 1.0f : -1.0f;
    }
    for (unsigned i = 0; i < num_points; i++)
        in[i] = lv_cmake((float)((i * 2654435761u >> 16 & 255) / 128.0 - 1.0),
                         (float)((i * 40503u >> 16 & 255) / 128.0 - 1.0));

    const float phase_step = 2.0f * 3.14159265f * 1000.0f / 2.6e6f;
    lv_32fc_t phase_inc = lv_cmake(cosf(phase_step), -sinf(phase_step));
    lv_32fc_t phase = lv_cmake(1.0f, 0.0f);

    /* warmup */
    for (int k = 0; k < 100; k++)
        KERNEL_FN(result, in, phase_inc, &phase,
                  (const float **)taps, num_taps, num_points);

    double t0 = now_s();
    for (int k = 0; k < iters; k++)
        KERNEL_FN(result, in, phase_inc, &phase,
                  (const float **)taps, num_taps, num_points);
    double dt = now_s() - t0;

    double samples = (double)iters * num_points;
    printf("{\"kernel\": \"%s\", \"num_points\": %u, \"taps\": %d, "
           "\"msamples_per_s\": %.2f, \"accum\": [%f, %f]}\n",
           KERNEL_NAME, num_points, num_taps, samples / dt / 1e6,
           lv_creal(result[0]), lv_cimag(result[0]));
    return 0;
}
