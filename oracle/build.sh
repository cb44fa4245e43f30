#!/bin/bash
# Build the reference pbrt binary (+ imgtool) as the correctness oracle,
# without modifying /root/reference: empty ext submodules (glog, ptex,
# openexr, zlib) are replaced by oracle/shim/glog, oracle/ptex_stub.cpp,
# the system OpenEXR-3.1 + Imath headers/libs, and system zlib.
# Output: /tmp/pbrt_oracle/pbrt and /tmp/pbrt_oracle/imgtool
set -e
REF=/root/reference/src
SHIM="$(cd "$(dirname "$0")" && pwd)"/shim
STUB="$(cd "$(dirname "$0")" && pwd)"/ptex_stub.cpp
OUT=${1:-/tmp/pbrt_oracle}
mkdir -p "$OUT/obj"

# SPECTRAL=1 builds the 60-bin SampledSpectrum variant (CMakeLists.txt:21)
# — required by the fork's hero_path/hero_path_mis integrators
SPECTRAL_DEF=""
if [ "${SPECTRAL:-0}" = "1" ]; then SPECTRAL_DEF="-DPBRT_SAMPLED_SPECTRUM"; fi
DEFS="$SPECTRAL_DEF -DNDEBUG -DPBRT_CONSTEXPR=constexpr -DPBRT_THREAD_LOCAL=thread_local \
 -DPBRT_HAVE_ALLOCA_H -DPBRT_HAVE_MEMORY_H -DPBRT_HAVE_HEX_FP_CONSTANTS \
 -DPBRT_HAVE_BINARY_CONSTANTS -DPBRT_HAVE_CONSTEXPR -DPBRT_HAVE_ALIGNAS \
 -DPBRT_HAVE_ALIGNOF -DPBRT_HAVE_ITIMER -DPBRT_HAVE_NONPOD_IN_UNIONS \
 -DPBRT_HAVE_MMAP -DPBRT_NOINLINE= \
 -DPBRT_HAVE_POSIX_MEMALIGN -DPBRT_IS_LINUX"
INC="-I$REF -I$REF/core -I$REF/ext -I$SHIM -I/usr/include/OpenEXR -I/usr/include/Imath"
CXX="g++ -std=c++17 -O2 -w -pthread $DEFS $INC"
LIBS="-lOpenEXR-3_1 -lIlmThread-3_1 -lIex-3_1 -lImath-3_1 -lz -pthread"

SRCS=$(ls $REF/core/*.cpp $REF/accelerators/*.cpp $REF/cameras/*.cpp \
          $REF/filters/*.cpp $REF/integrators/*.cpp $REF/lights/*.cpp \
          $REF/materials/*.cpp $REF/media/*.cpp $REF/portals/*.cpp \
          $REF/samplers/*.cpp $REF/shapes/*.cpp $REF/textures/*.cpp \
          | grep -v textures/ptex.cpp)
SRCS="$SRCS $STUB $REF/ext/lodepng.cpp $REF/ext/rply.cpp $REF/ext/targa.cpp \
      $REF/ext/sexpresso.cpp"
# C source: must compile with C linkage (its header is extern-C-guarded)
gcc -O2 -w -c $REF/ext/ArHosekSkyModel.c -o "$OUT/obj/ext_ArHosekSkyModel.o"

echo "compiling $(echo $SRCS | wc -w) sources -> $OUT"
pids=()
for s in $SRCS; do
  # object name includes parent dir: shapes/triangle.cpp and
  # filters/triangle.cpp must not collide
  o="$OUT/obj/$(basename "$(dirname "$s")")_$(basename "$s" | sed 's/\.[^.]*$//').o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    $CXX -c "$s" -o "$o" &
    pids+=($!)
    # throttle to nproc parallel compiles
    while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done
  fi
done
wait

$CXX "$REF/main/pbrt.cpp" "$OUT"/obj/*.o -o "$OUT/pbrt" $LIBS
$CXX "$REF/tools/imgtool.cpp" "$OUT"/obj/*.o -o "$OUT/imgtool" $LIBS
echo "built: $OUT/pbrt, $OUT/imgtool"
