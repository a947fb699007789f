#!/bin/bash
# Randomized x264 option-combination conformance campaign: encodes N
# synthetic streams with pseudo-random encoder option mixes (interlaced
# MBAFF, B-frames, multi-ref, 8x8dct, multi-slice, weightp, b-pyramid,
# 4:2:2, interlaced-motion content) and requires every one to be
# bin-IDENTICAL under the ptrace oracle (tools/diff_oracle.sh) AND
# sync-clean under the selftest — sweeping option-interaction corners
# the fixed test matrix does not enumerate.
#
# Usage: oracle_campaign.sh [N=30] [SEED0=1000]
# Requires the one-time /tmp oracle setup (README-oracle.md).
set -u
cd "$(dirname "$0")"
N=${1:-30}
SEED0=${2:-1000}
PASS=0; FAIL=0
# First-party PAFF corpus (paff_gen.py — x264 cannot emit field
# pictures): CABAC scenarios additionally go through the bin oracle;
# every scenario must be sync-clean.
for sc in ip_basic multiref skip_heavy b_spatial b_temporal adaptive \
          mbadaptive_fields field_lt field_mark cabac_ip cabac_b \
          cabac_b_temporal cabac_resid cabac_8x8; do
  s=/tmp/oracle_campaign_paff_$sc.lp264
  python3 ./paff_gen.py "$sc" "$s" >/dev/null 2>&1 \
    || { echo "paff:$sc GEN-FAIL"; FAIL=$((FAIL+1)); continue; }
  st=$(./entdec_selftest "$s" 2>/dev/null | tail -1)
  ok=1
  echo "$st" | grep -q " 0 bad" || ok=0
  r=""
  case "$sc" in cabac_*)
    r=$(./diff_oracle.sh "$s" 99 2>/dev/null | tail -1)
    echo "$r" | grep -q IDENTICAL || ok=0 ;;
  esac
  if [ "$ok" = 1 ]; then
    PASS=$((PASS+1)); echo "paff:$sc OK $st $r"
  else
    FAIL=$((FAIL+1)); echo "paff:$sc FAIL | $st | $r"
  fi
  rm -f "$s"
done
# First-party separate_colour_plane corpus (sep_gen.py — libavcodec
# rejects the feature, so the oracle anchor is the MONO TWIN: same MB
# payloads as a chroma_format_idc-0 stream). Checks per scenario:
# separate stream sync-clean, plane-0 export byte-equal to the twin
# (mvdump), twin sync-clean, and (CABAC) the twin bin-IDENTICAL.
for sc in ip multislice b_spatial b_temporal diverge cabac_ip cabac_b \
          cabac_resid field_ip field_b_spatial field_b_temporal \
          field_adaptive field_cabac mbaff_ip mbaff_b mbaff_diverge \
          mbaff_adaptive; do
  s=/tmp/oracle_campaign_sep_$sc.lp264
  m=/tmp/oracle_campaign_sepmono_$sc.lp264
  python3 - "$sc" "$s" "$m" >/dev/null 2>&1 <<'PYEOF' \
    || { echo "sep:$sc GEN-FAIL"; FAIL=$((FAIL+1)); continue; }
import sys
sys.path.insert(0, ".")
import sep_gen
sc, s, m = sys.argv[1:4]
sep_gen.SCENARIOS[sc](separate=True).write(s)
sep_gen.SCENARIOS[sc](separate=False).write(m)
PYEOF
  ok=1
  st=$(./entdec_selftest "$s" 2>/dev/null | tail -1)
  echo "$st" | grep -q " 0 bad" || ok=0
  ./entdec_selftest "$m" 2>/dev/null | tail -1 | grep -q " 0 bad" || ok=0
  [ "$(./mvdump "$s" 2>/dev/null)" = "$(./mvdump "$m" 2>/dev/null)" ] || ok=0
  r=""
  case "$sc" in cabac_*)
    r=$(./diff_oracle.sh "$m" 99 2>/dev/null | tail -1)
    echo "$r" | grep -q IDENTICAL || ok=0 ;;
  esac
  if [ "$ok" = 1 ]; then
    PASS=$((PASS+1)); echo "sep:$sc OK $st $r"
  else
    FAIL=$((FAIL+1)); echo "sep:$sc FAIL | $st | $r"
  fi
  rm -f "$s" "$m"
done
# First-party DPB-feature corpus (dpb_gen.py — long-term refs, MMCO,
# list-mod op 2, POC type 1; x264 emits none of these). CAVLC-only:
# sync-clean here; MV-exactness vs libavcodec is CI-pinned by
# tests/test_codec.py TestDpbFeatures.
for sc in lt_idr mmco5 mmco5_poc mmco36 lt_listmod lt_temporal poc1 poc1_wrap; do
  s=/tmp/oracle_campaign_dpb_$sc.lp264
  python3 ./dpb_gen.py "$sc" "$s" >/dev/null 2>&1 \
    || { echo "dpb:$sc GEN-FAIL"; FAIL=$((FAIL+1)); continue; }
  st=$(./entdec_selftest "$s" 2>/dev/null | tail -1)
  if echo "$st" | grep -q " 0 bad"; then
    PASS=$((PASS+1)); echo "dpb:$sc OK $st"
  else
    FAIL=$((FAIL+1)); echo "dpb:$sc FAIL | $st"
  fi
  rm -f "$s"
done
for i in $(seq 1 "$N"); do
  seed=$((SEED0 + i))
  bf=$((seed % 4)); ref=$((1 + seed % 3)); il=$((seed % 2))
  dct=$((seed / 2 % 2)); sl=$((1 + seed % 3)); wp=$((seed / 3 % 3))
  q=$((22 + seed % 16))
  pat=$( [ $((seed % 3)) = 0 ] && echo fields || echo "" )
  csp=$( [ $((seed % 5)) = 0 ] && echo 422 || echo "" )
  opts="interlaced=$il:bframes=$bf:ref=$ref:8x8dct=$dct:slices=$sl:weightp=$wp"
  [ $((seed % 4)) = 0 ] && opts="$opts:b-pyramid=normal"
  s=/tmp/oracle_campaign_$i.264
  COVA_TEST_PATTERN=$pat COVA_TEST_CSP=$csp \
    ./make_test_stream "$s" 96 96 25 "$opts" "q$q" >/dev/null 2>&1 \
    || { echo "$i ENCODE-SKIP $opts"; continue; }
  r=$(./diff_oracle.sh "$s" 25 2>/dev/null | tail -1)
  st=$(./entdec_selftest "$s" 25 2>/dev/null | tail -1)
  if echo "$r" | grep -q IDENTICAL && echo "$st" | grep -q "0 bad"; then
    PASS=$((PASS+1)); echo "$i OK   $opts q$q pat=$pat csp=$csp $r"
  else
    FAIL=$((FAIL+1)); echo "$i FAIL $opts q$q pat=$pat csp=$csp | $r | $st"
  fi
  rm -f "$s"
done
echo "campaign: $PASS pass, $FAIL fail"
[ "$FAIL" = 0 ]
