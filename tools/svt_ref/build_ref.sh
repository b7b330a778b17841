#!/bin/bash
# Build the upstream SVT-VP9 reference encoder WITHOUT nasm/yasm, for the
# quality-parity harness (tools/bd_rate.py).
#
# The reference CMake requires an ASM_NASM compiler (CMakeLists.txt:23).
# We supply a stub assembler that emits empty objects for the 8 .asm
# files, then resolve the ~59 resulting undefined symbols with C shims
# (asm_shims.c) that delegate to the reference's own _c kernels - the
# function-pointer dispatch (vpx_dsp_rtcd.h) behavior is preserved and
# output is bit-identical to a genuine C-only build.
#
# Usage: tools/svt_ref/build_ref.sh [build_dir]
# Produces: $build_dir/SvtVp9EncApp  (and libSvtVp9Enc.so)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference
BUILD="${1:-/tmp/svt_ref_build}"
SRC="$BUILD/src"

# the reference CMake hard-sets its output dirs into the SOURCE tree
# (CMakeLists.txt:63-68); ours is read-only, so build from a copy
if [ ! -f "$SRC/CMakeLists.txt" ]; then
  mkdir -p "$SRC"
  cp -r "$REF/CMakeLists.txt" "$REF/Source" "$SRC/"
fi
mkdir -p "$BUILD/bin"

# stub assembler: empty object for every .asm EXCEPT one, which instead
# carries the C shims so they join the library link naturally
cat > "$BUILD/bin/nasm" <<EOF
#!/bin/bash
out=""; prev=""; src=""
for a in "\$@"; do [ "\$prev" = "-o" ] && out="\$a"; prev="\$a"; done
for a in "\$@"; do case "\$a" in *.asm) src="\$a";; esac; done
if [ -z "\$out" ] && [ -n "\$src" ]; then out="\${src%.asm}.o"; fi
case "\$src" in
  *EbPictureOperators_SSE2.asm) exec gcc -O2 -fPIC -c "$HERE/asm_shims.c" -o "\$out";;
  *) exec gcc -x c -c /dev/null -o "\$out";;
esac
EOF
chmod +x "$BUILD/bin/nasm"

cmake -S "$SRC" -B "$BUILD/out" -G Ninja \
  -DCMAKE_BUILD_TYPE=Release \
  -DCMAKE_ASM_NASM_COMPILER="$BUILD/bin/nasm" >/dev/null
ninja -C "$BUILD/out" >/dev/null

APP=$(find "$SRC/Bin" -name SvtVp9EncApp -type f 2>/dev/null | head -1)
echo "built: $APP"
