#!/bin/bash
# Build the reference dav1d (pure C, no asm) out-of-tree as a TEST ORACLE.
# The reference at /root/reference is read-only; we build into $BUILD.
# This binary/library is used only by tests (golden MD5 / plane comparison);
# no reference code enters this repo.
set -e
REF=/root/reference
BUILD=${1:-/tmp/dav1d-ref}
mkdir -p "$BUILD/obj" "$BUILD/include"

cat > "$BUILD/include/config.h" <<'CFG'
#pragma once
#define ARCH_AARCH64 0
#define ARCH_ARM 0
#define ARCH_LOONGARCH 0
#define ARCH_LOONGARCH64 0
#define ARCH_PPC64LE 0
#define ARCH_RISCV 0
#define ARCH_X86 0
#define ARCH_X86_32 0
#define ARCH_X86_64 0
#define CONFIG_16BPC 1
#define CONFIG_8BPC 1
#define CONFIG_LOG 1
#define HAVE_ASM 0
#define HAVE_ALIGNED_ALLOC 1
#define HAVE_POSIX_MEMALIGN 1
#define HAVE_UNISTD_H 1
#define HAVE_PTHREAD_GETAFFINITY_NP 1
#define HAVE_PTHREAD_SETNAME_NP 1
#define ENDIANNESS_BIG 0
CFG
cat > "$BUILD/include/vcs_version.h" <<'CFG'
#define DAV1D_VERSION "1.5.4-oracle"
CFG
cat > "$BUILD/include/cli_config.h" <<'CFG'
#pragma once
#define HAVE_CLOCK_GETTIME 1
CFG

CFLAGS="-O2 -g0 -std=c99 -D_GNU_SOURCE -D_POSIX_C_SOURCE=200112L -I$BUILD/include -I$REF -I$REF/include -I$REF/include/dav1d -I$REF/src -w -fPIC"

compile() { # src obj extra...
  local src=$1 obj=$2; shift 2
  if [ ! -f "$BUILD/obj/$obj" ] || [ "$src" -nt "$BUILD/obj/$obj" ]; then
    gcc $CFLAGS "$@" -c "$src" -o "$BUILD/obj/$obj"
  fi
}

CORE="cdf cpu ctx data decode dequant_tables getbits intra_edge itx_1d lf_mask lib log mem msac obu pal picture qm ref refmvs scan tables thread_task warpmv wedge"
TMPL="cdef_apply_tmpl cdef_tmpl fg_apply_tmpl filmgrain_tmpl ipred_prepare_tmpl ipred_tmpl itx_tmpl lf_apply_tmpl loopfilter_tmpl looprestoration_tmpl lr_apply_tmpl mc_tmpl recon_tmpl"

for f in $CORE; do compile "$REF/src/$f.c" "$f.o"; done
for f in $TMPL; do
  compile "$REF/src/$f.c" "${f}_8.o" -DBITDEPTH=8
  compile "$REF/src/$f.c" "${f}_16.o" -DBITDEPTH=16
done

gcc -shared -o "$BUILD/libdav1d.so" "$BUILD"/obj/*_8.o "$BUILD"/obj/*_16.o \
  $(for f in $CORE; do echo "$BUILD/obj/$f.o"; done) -lpthread -lm

# CLI
TOOLS="dav1d dav1d_cli_parse"
TIN="input/input input/ivf input/annexb input/section5"
TOUT="output/output output/md5 output/y4m2 output/yuv output/null"
TOBJS=""
for f in $TOOLS $TIN $TOUT; do
  o="tools_$(basename $f).o"
  compile "$REF/tools/$f.c" "$o" -I"$REF/tools"
  TOBJS="$TOBJS $BUILD/obj/$o"
done
gcc -o "$BUILD/dav1d" $TOBJS "$BUILD/libdav1d.so" -Wl,-rpath,"$BUILD" -lpthread -lm
echo "Built: $BUILD/dav1d"
"$BUILD/dav1d" --version
