#!/bin/bash
# Build + run the reference VOLK correlator baseline (see volk_baseline.c).
# The kernel header is included directly from the read-only reference mount;
# a shim volk_gnsssdr.h satisfies the kernel's include without the
# generated-header machinery of the full volk build.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
VOLK=$REF/src/algorithms/libs/volk_gnsssdr_module/volk_gnsssdr

BUILD=${BUILD:-/tmp/volk_baseline_build}
mkdir -p "$BUILD/shim/volk_gnsssdr"
cat > "$BUILD/shim/volk_gnsssdr/volk_gnsssdr.h" <<'EOF'
/* shim: the kernel only needs the common typedefs */
#include <volk_gnsssdr/volk_gnsssdr_common.h>
EOF

# prefer the AVX variant when the host supports it
if grep -q avx /proc/cpuinfo; then
  FN=volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn_u_avx
else
  FN=volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn_generic
fi

gcc -O3 -march=native -ffast-math -DLV_HAVE_GENERIC -DLV_HAVE_SSE -DLV_HAVE_SSE2 -DLV_HAVE_SSE3 -DLV_HAVE_AVX \
  "-DVOLK_KERNEL_HEADER=<volk_gnsssdr/volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn.h>" \
  "-DKERNEL_FN=$FN" "-DKERNEL_NAME=\"$FN\"" \
  -I "$BUILD/shim" -I "$VOLK/include" -I "$VOLK/kernels" \
  -o "$BUILD/volk_baseline" volk_baseline.c -lm

"$BUILD/volk_baseline" "$@"
