#!/bin/bash
# Differential CABAC bin-trace check: decodes a length-prefixed stream
# with (a) the first-party entropy decoder and (b) the reference
# libavcodec decoder under the ptrace bin tracer, then reports the first
# diverging (ctx, bin) decision.
#
# Setup (one-time, in /tmp): see tools/README-oracle.md
#   cabtrace      — ptrace tracer
#   dec_static    — statically linked libavcodec h264 decoder
# Usage: diff_oracle.sh STREAM.lp264 [nframes]
set -e
STREAM=$1
N=${2:-1}
DIR=$(dirname "$0")
A1=$(nm /tmp/dec_static | awk '$3=="get_cabac"{print "0x"$1}')
A2=$(nm /tmp/dec_static | awk '$3=="get_cabac_noinline"{print "0x"$1}')
/tmp/cabtrace /tmp/dec_static $A1 $A2 -- "$STREAM" $N > /tmp/oracle_raw.log 2>/tmp/oracle.err
COVA_ENTDEC_TRACE=2 "$DIR/entdec_selftest" "$STREAM" $N 2>/tmp/mine.log >/dev/null || true
# libavcodec decodes significance/last maps in decode_significance_x86
# (not hooked), so drop ctx 105-226 and 402-425 from both sides.
# Blindspots of the tracer (inlined in libavcodec): significance maps
# (105-226, 402-425) and mvd unary prefix bins (41-46, 48-53).
# plus ref_idx (54-59) and intra-pred prev/rem flags (68-69), whose
# get_cabac calls are inlined at some call sites.
# 4:4:4 significance/last ranges (Cb/Cr cats 6-13: 484-698, 718-756)
# are also decoded in libavcodec's asm significance loop -> blind.
# Field-coded (MBAFF) sig/last ranges 277-398 and 436-459 are likewise
# decoded in the asm significance loop -> blind. (The 4:4:4 FIELD
# sig/last ranges overlap the frame abs-level offsets 708/766 in the
# 1024-context space, so they are NOT filtered — don't bin-diff a
# stream that combines 4:4:4 with MBAFF field macroblocks; sync health
# via entdec_selftest still covers it.)
flt() { awk -F'[= ]' '{c=$3} c>=105 && c<=226 {next} c>=402 && c<=425 {next} c>=484 && c<=698 {next} c>=718 && c<=756 {next} c>=277 && c<=398 {next} c>=436 && c<=459 {next} (c>=43 && c<=46) || (c>=50 && c<=53) || (c>=54 && c<=59) || c==68 || c==69 {next} {print}'; }
flt < /tmp/oracle_raw.log > /tmp/oracle.log
grep "^D " /tmp/mine.log | flt > /tmp/mine_bins.log
if diff -q /tmp/oracle.log /tmp/mine_bins.log >/dev/null 2>&1; then
  echo "IDENTICAL ($(wc -l < /tmp/oracle.log) bins)"
else
  echo "DIVERGED:"
  diff /tmp/oracle.log /tmp/mine_bins.log | head -8
  echo "... first diff at line $(diff /tmp/oracle.log /tmp/mine_bins.log | head -1)"
fi
