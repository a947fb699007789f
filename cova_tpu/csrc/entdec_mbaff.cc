// MBAFF (macroblock-adaptive frame/field) entropy-decode path.
//
// Separate translation unit so the progressive hot path in entdec.cc
// keeps zero MBAFF branches. Reference parity target: the reference's
// patched FFmpeg decoder accepts any conforming H.264 stream
// (/root/reference/README.md:94-114); this closes the interlace gap for
// MBAFF frames. PAFF field pictures decode through the progressive
// machinery at half height (see entdec.cc; validated on first-party
// conforming field streams from tools/paff_gen.py).
//
// Design notes:
//  * Slice data layer follows H.264 7.3.4 (pair loop, mb_skip /
//    mb_field_decoding_flag ordering, end_of_slice only after bottom
//    members) with the 7.4.4 inference for fully-skipped pairs.
//  * Neighbor derivation (6.4.10/6.4.11, Table 6-4) is implemented
//    GEOMETRICALLY rather than as a transcribed table: a macroblock
//    pair is a 16x32 luma strip; frame members own rows [0,16) and
//    [16,32), field members own the even and odd rows. A neighbor
//    sample location in the current MB's own sampling maps to an
//    absolute strip row, which the neighbor pair's coding mode then
//    maps back to (member, yW). Field macroblocks neighbor upward in
//    the same field parity for the top member and to the geometrically
//    adjacent row for the bottom member — both fall out of the parity
//    arithmetic below.
//  * Context derivations implement the 9.3.3.1.1.x MBAFF rules:
//    field/frame neighbor scaling of |mvd| (unit conversion into the
//    current MB's sampling) and of ref_idx (field lists are twice as
//    long), mb_field_decoding_flag contexts 70..72.
//  * Motion-vector reconstruction scales neighbor MVs/refs across
//    field/frame boundaries (8.4.1.3.2). B-direct uses spatial
//    prediction WITH the colZero refinement: the DPB stores MBAFF
//    pictures (address-order motion snapshots + pair field map + both
//    field POCs) and col_motion_mf() implements the 8.4.1.2.2
//    member/row mapping geometrically; colZero tests the UNSCALED
//    colocated MV (the vertMvScale adjustment is temporal-only — see
//    the note in col_motion_mf).
//    Temporal direct degrades to spatial (x264 forces spatial direct
//    for interlaced encodes, so no oracle stream exists for it).
//  * Validated bin-exact against libavcodec via tools/diff_oracle.sh
//    on x264 MBAFF streams (see tests/test_codec.py TestMbaff), and
//    MV-exact per pair-aggregated sums on those streams with no
//    direct-MB bound; B-direct cells are additionally pinned PER CELL
//    through the MV-revealing-neighbor corpus
//    (tools/sep_gen.py scenario_mbaff_reveal,
//    tests/test_codec.py TestMbaffDirectReveal).

#include <algorithm>
#include <cstdio>
#include <cstdlib>

#include "cavlc_tables.h"
#include "entdec.h"

namespace cova {

namespace {

// Same load-time trace resolution as entdec.cc (this TU is cold; the
// duplication keeps the hot TU's static private).
const int g_trace_mf = [] {
  const char* e = getenv("COVA_ENTDEC_TRACE");
  return e ? atoi(e) : 0;
}();
inline bool trace_enabled() { return g_trace_mf >= 1; }
inline int trace_level_mf() { return g_trace_mf; }

inline int div2_trunc(int v) { return v >= 0 ? v >> 1 : -((-v) >> 1); }

// 4x4 luma block coding order (8x8 Z order, 4x4 Z within) -> MB raster.
inline int blk_raster_mf(int i8, int i4) {
  int x4 = 2 * (i8 & 1) + (i4 & 1);
  int y4 = 2 * (i8 >> 1) + (i4 >> 1);
  return y4 * 4 + x4;
}

}  // namespace

// ---------------------------------------------------------------------------
// Neighbor resolution (6.4.10/6.4.11, geometric form)
// ---------------------------------------------------------------------------

EntropyDecoder::Loc EntropyDecoder::mbaff_loc(int xN, int yN, int maxW,
                                              int maxH) {
  // Inside the current macroblock: the caller's own cells.
  if (xN >= 0 && xN < maxW && yN >= 0 && yN < maxH)
    return {&mbs_[plane_off_ + cur_addr_], xN, yN};

  int p = cur_addr_ >> 1;
  int px = p % mb_w_, py = p / mb_w_;
  int bottom = cur_addr_ & 1;

  int npx = px + (xN < 0 ? -1 : (xN >= maxW ? 1 : 0));
  if (npx < 0 || npx >= mb_w_) return {nullptr, 0, 0};
  int xW = xN & (maxW - 1);  // maxW is a power of two

  // Absolute strip row (within a pair column, height 2*maxH) of the
  // requested sample, in frame-line units of the pair strip.
  int npy = py;
  int r;
  if (yN >= 0) {
    r = cur_field_ ? 2 * yN + bottom : maxH * bottom + yN;
  } else {
    // yN < 0: rows above the current MB in its own sampling — frame
    // members step one strip row, field members two (same parity).
    r = cur_field_ ? 2 * yN + bottom : maxH * bottom + yN;
    if (r < 0) {
      npy = py - 1;
      r += 2 * maxH;
    }
  }
  if (npy < 0 || r < 0 || r >= 2 * maxH) return {nullptr, 0, 0};

  size_t npair = (size_t)npy * mb_w_ + npx;
  // The pair's coding mode: both members carry field_flag; read the top
  // member (set before either member parses). A pair not decoded in
  // this picture resolves as frame — the member then fails the
  // availability check below either way.
  MbCtx* ntop = &mbs_[plane_off_ + npair * 2];
  bool nfield = ntop->gen == gen_ && ntop->field_flag;
  int member, yW;
  if (nfield) {
    member = r & 1;
    yW = r >> 1;
  } else {
    member = r >= maxH;
    yW = r - maxH * member;
  }
  MbCtx* m = &mbs_[plane_off_ + npair * 2 + member];
  if (m->gen != gen_ || !m->decoded || m->slice_id != slice_id_)
    return {nullptr, 0, 0};
  return {m, xW, yW};
}

// Fetch the 4x4 motion cell containing relative luma sample (xs, ys),
// scaled into the current MB's sampling (8.4.1.3.2): a field neighbor
// of a frame MB has its vertical MV doubled and its (twice-as-long
// field list) ref index halved; a frame neighbor of a field MB the
// inverse.
EntropyDecoder::CellRef EntropyDecoder::cell_mf(int list, int xs, int ys) {
  CellRef r;
  Loc l = mbaff_loc(xs, ys, 16, 16);
  if (!l.mb) return r;
  r.avail = true;
  r.intra = l.mb->intra;
  int idx = (l.yW >> 2) * 4 + (l.xW >> 2);
  int ref;
  int mvx, mvy;
  if (l.mb->uniform) {
    ref = l.mb->uniform_ref[list];
    mvx = l.mb->uniform_mv[list][0];
    mvy = l.mb->uniform_mv[list][1];
  } else {
    ref = l.mb->ref4[list][idx];
    mvx = l.mb->mv4[list][idx][0];
    mvy = l.mb->mv4[list][idx][1];
  }
  bool nfield = l.mb->field_flag;
  if (ref >= 0 && nfield != cur_field_) {
    if (cur_field_) {  // frame neighbor of a field MB
      ref <<= 1;
      mvy = div2_trunc(mvy);
    } else {  // field neighbor of a frame MB
      ref >>= 1;
      mvy *= 2;
    }
  }
  r.ref = (int8_t)ref;
  r.mv[0] = (int16_t)mvx;
  r.mv[1] = (int16_t)mvy;
  return r;
}

// ---------------------------------------------------------------------------
// CABAC context derivations (9.3.3.1.1.x, MBAFF variants)
// ---------------------------------------------------------------------------

int EntropyDecoder::cabac_mb_skip_mf(bool b_slice) {
  Loc a = mbaff_loc(-1, 0, 16, 16);
  Loc b = mbaff_loc(0, -1, 16, 16);
  int ctx = (a.mb && !a.mb->skip ? 1 : 0) + (b.mb && !b.mb->skip ? 1 : 0);
  return cabac_.decision((b_slice ? 24 : 11) + ctx);
}

int EntropyDecoder::cabac_field_flag_mf(int px, int py) {
  // 9.3.3.1.1.2: condTermFlagN = neighbor PAIR available (same slice)
  // and field-coded. Left pair, then above pair.
  auto pf = [&](int nx, int ny) -> int {
    if (nx < 0 || ny < 0) return 0;
    MbCtx* t = &mbs_[plane_off_ + ((size_t)ny * mb_w_ + nx) * 2];
    if (t->gen != gen_ || !t->decoded || t->slice_id != slice_id_) return 0;
    return t->field_flag ? 1 : 0;
  };
  int inc = pf(px - 1, py) + pf(px, py - 1);
  return cabac_.decision(70 + inc);
}

int EntropyDecoder::cabac_ref_idx_mf(int list, int x0c, int y0c) {
  // 9.3.3.1.1.6 with the MBAFF refIdxZeroFlag adjustment: a FIELD
  // neighbor of a FRAME macroblock indexes a twice-as-long list, so its
  // condition is ref > 1; the opposite pairing shifts left, which does
  // not change > 0.
  auto flag = [&](int xs, int ys) -> int {
    Loc l = mbaff_loc(xs, ys, 16, 16);
    if (!l.mb || l.mb->intra) return 0;
    int idx = (l.yW >> 2) * 4 + (l.xW >> 2);
    if (l.mb->direct_mask & (1u << idx)) return 0;
    int ref = l.mb->uniform ? l.mb->uniform_ref[list] : l.mb->ref4[list][idx];
    if (ref <= 0) return 0;
    if (!cur_field_ && l.mb->field_flag) ref >>= 1;
    return ref > 0 ? 1 : 0;
  };
  int ctx = flag(4 * x0c - 1, 4 * y0c) + 2 * flag(4 * x0c, 4 * y0c - 1);
  int ref = 0;
  int c = 54 + ctx;
  while (cabac_.decision(c)) {
    ref++;
    c = 54 + (ref == 1 ? 4 : 5);
    if (ref > 31) break;  // corrupt stream guard
  }
  return ref;
}

void EntropyDecoder::cabac_mvd_pair_mf(int list, int x0c, int y0c,
                                       int out[2]) {
  // 9.3.3.1.1.7: |mvd| of the left/top neighbor cells; the vertical
  // component converts into the current MB's sampling when the
  // field/frame modes differ.
  int sum[2] = {0, 0};
  auto accum = [&](int xs, int ys) {
    Loc l = mbaff_loc(xs, ys, 16, 16);
    if (!l.mb || l.mb->intra) return;
    if (l.mb->uniform) return;  // skip/direct fills carry zero mvd
    int idx = (l.yW >> 2) * 4 + (l.xW >> 2);
    if (l.mb->ref4[list][idx] < 0) return;
    int ax = std::abs((int)l.mb->mvd4[list][idx][0]);
    int ay = std::abs((int)l.mb->mvd4[list][idx][1]);
    if (l.mb->field_flag != cur_field_) ay = cur_field_ ? ay >> 1 : ay * 2;
    sum[0] += ax;
    sum[1] += ay;
  };
  accum(4 * x0c - 1, 4 * y0c);
  accum(4 * x0c, 4 * y0c - 1);
  for (int comp = 0; comp < 2; comp++) {
    int inc = sum[comp] < 3 ? 0 : (sum[comp] > 32 ? 2 : 1);
    int base = comp == 0 ? 40 : 47;
    if (!cabac_.decision(base + inc)) {
      out[comp] = 0;
      continue;
    }
    int n = 1;
    while (n < 9) {
      int c = base + 2 + std::min(n, 4);
      if (!cabac_.decision(c)) break;
      n++;
    }
    int val = (n == 9) ? 9 + (int)cabac_.bypass_eg(3) : n;
    int sign = cabac_.bypass();
    out[comp] = sign ? -val : val;
  }
}

int EntropyDecoder::cabac_cbp_luma_mf() {
  // 9.3.3.1.1.4 via the neighboring-8x8 derivation: left neighbors per
  // 8x8 row, top neighbors per 8x8 column (distinct MBs possible when
  // pair coding modes mix).
  auto abit = [&](int row8) -> int {
    Loc l = mbaff_loc(-1, 8 * row8, 16, 16);
    if (!l.mb) return 1;  // unavailable treated as coded
    if (l.mb->pcm) return 1;
    int nb8 = (l.yW >> 3) * 2 + 1;  // right 8x8 column of the left MB
    return (l.mb->cbp_luma >> nb8) & 1;
  };
  auto bbit = [&](int col8) -> int {
    Loc l = mbaff_loc(8 * col8, -1, 16, 16);
    if (!l.mb) return 1;
    if (l.mb->pcm) return 1;
    int nb8 = 2 + col8;  // bottom 8x8 row of the top MB
    return (l.mb->cbp_luma >> nb8) & 1;
  };
  int cbp = 0;
  int ctx = (abit(0) ? 0 : 1) + 2 * (bbit(0) ? 0 : 1);
  cbp |= cabac_.decision(73 + ctx);
  ctx = ((cbp & 1) ? 0 : 1) + 2 * (bbit(1) ? 0 : 1);
  cbp |= cabac_.decision(73 + ctx) << 1;
  ctx = (abit(1) ? 0 : 1) + 2 * ((cbp & 1) ? 0 : 1);
  cbp |= cabac_.decision(73 + ctx) << 2;
  ctx = ((cbp & 4) ? 0 : 1) + 2 * ((cbp & 2) ? 0 : 1);
  cbp |= cabac_.decision(73 + ctx) << 3;
  return cbp;
}

int EntropyDecoder::cbf_ctx_luma_dc_mf(const MbCtx* cur, int plane) {
  Loc la = mbaff_loc(-1, 0, 16, 16);
  Loc lb = mbaff_loc(0, -1, 16, 16);
  int a = cbf_cond(la.mb, cur->intra, 0, plane, 0);
  int b = cbf_cond(lb.mb, cur->intra, 0, plane, 0);
  return a + 2 * b;
}

int EntropyDecoder::cbf_ctx_luma4x4_mf(const MbCtx* cur, int blk, int plane) {
  int x4 = blk & 3, y4 = blk >> 2;
  int a, b;
  if (x4 > 0) {
    a = (cur->cbf_luma[plane] >> (blk - 1)) & 1;
  } else {
    Loc l = mbaff_loc(-1, 4 * y4, 16, 16);
    a = cbf_cond(l.mb, cur->intra, 1, plane,
                 l.mb ? (l.yW >> 2) * 4 + 3 : 0);
  }
  if (y4 > 0) {
    b = (cur->cbf_luma[plane] >> (blk - 4)) & 1;
  } else {
    Loc l = mbaff_loc(4 * x4, -1, 16, 16);
    b = cbf_cond(l.mb, cur->intra, 1, plane,
                 l.mb ? (l.yW >> 2) * 4 + x4 : 0);
  }
  return a + 2 * b;
}

int EntropyDecoder::cbf_ctx_luma8x8_mf(const MbCtx* cur, int i8, int plane) {
  // 9.3.3.1.1.9 for 8x8 categories (4:4:4 only): the neighbor transform
  // block is the adjacent 8x8 ONLY when that MB is 8x8-transformed.
  auto cond = [&](bool left) -> int {
    int nb8;
    const MbCtx* m;
    int internal = left ? (i8 & 1) : (i8 >= 2);
    if (internal) {
      m = cur;
      nb8 = left ? i8 - 1 : i8 - 2;
    } else {
      Loc l = left ? mbaff_loc(-1, 8 * (i8 >> 1), 16, 16)
                   : mbaff_loc(8 * (i8 & 1), -1, 16, 16);
      m = l.mb;
      if (!m) return cur->intra ? 1 : 0;
      if (m->pcm) return 1;
      if (m->skip || !m->t8x8) return 0;
      nb8 = left ? (l.yW >> 3) * 2 + 1 : 2 + (i8 & 1);
    }
    return (m->cbf_luma[plane] >> blk_raster_mf(nb8, 0)) & 1;
  };
  return cond(true) + 2 * cond(false);
}

int EntropyDecoder::cbf_ctx_chroma_dc_mf(const MbCtx* cur, int comp) {
  Loc la = mbaff_loc(-1, 0, 16, 16);
  Loc lb = mbaff_loc(0, -1, 16, 16);
  int a = cbf_cond(la.mb, cur->intra, 2, comp, 0);
  int b = cbf_cond(lb.mb, cur->intra, 2, comp, 0);
  return a + 2 * b;
}

int EntropyDecoder::cbf_ctx_chroma_ac_mf(const MbCtx* cur, int comp,
                                         int blk) {
  // Chroma AC blocks form a 2-wide grid (2x2 in 4:2:0, 2x4 in 4:2:2);
  // neighbor lookups run in chroma sample geometry (8-wide, 8- or
  // 16-tall macroblocks).
  int ch = active_sps_->chroma_format_idc == 2 ? 16 : 8;
  int x2 = blk & 1, y2 = blk >> 1;
  int a, b;
  if (x2 > 0) {
    a = (cur->cbf_chroma_ac[comp] >> (blk - 1)) & 1;
  } else {
    Loc l = mbaff_loc(-1, 4 * y2, 8, ch);
    a = cbf_cond(l.mb, cur->intra, 3, comp, l.mb ? (l.yW >> 2) * 2 + 1 : 0);
  }
  if (y2 > 0) {
    b = (cur->cbf_chroma_ac[comp] >> (blk - 2)) & 1;
  } else {
    Loc l = mbaff_loc(4 * x2, -1, 8, ch);
    b = cbf_cond(l.mb, cur->intra, 3, comp,
                 l.mb ? (l.yW >> 2) * 2 + x2 : 0);
  }
  return a + 2 * b;
}

// ---------------------------------------------------------------------------
// CAVLC nC derivations (9.2.1, MBAFF neighbor mapping)
// ---------------------------------------------------------------------------

int EntropyDecoder::nc_luma_mf(const MbCtx* cur, int blk, int plane) {
  int x4 = blk & 3, y4 = blk >> 2;
  int na = -1, nb = -1;
  if (x4 > 0) {
    na = cur->nnz4[plane][blk - 1];
  } else {
    Loc l = mbaff_loc(-1, 4 * y4, 16, 16);
    if (l.mb) na = l.mb->pcm ? 16 : l.mb->nnz4[plane][(l.yW >> 2) * 4 + 3];
  }
  if (y4 > 0) {
    nb = cur->nnz4[plane][blk - 4];
  } else {
    Loc l = mbaff_loc(4 * x4, -1, 16, 16);
    if (l.mb) nb = l.mb->pcm ? 16 : l.mb->nnz4[plane][(l.yW >> 2) * 4 + x4];
  }
  if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
  if (na >= 0) return na;
  if (nb >= 0) return nb;
  return 0;
}

int EntropyDecoder::nc_chroma_mf(const MbCtx* cur, int comp, int blk) {
  int ch = active_sps_->chroma_format_idc == 2 ? 16 : 8;
  int x2 = blk & 1, y2 = blk >> 1;
  int na = -1, nb = -1;
  if (x2 > 0) {
    na = cur->nnzc[comp][blk - 1];
  } else {
    Loc l = mbaff_loc(-1, 4 * y2, 8, ch);
    if (l.mb) na = l.mb->pcm ? 16 : l.mb->nnzc[comp][(l.yW >> 2) * 2 + 1];
  }
  if (y2 > 0) {
    nb = cur->nnzc[comp][blk - 2];
  } else {
    Loc l = mbaff_loc(4 * x2, -1, 8, ch);
    if (l.mb) nb = l.mb->pcm ? 16 : l.mb->nnzc[comp][(l.yW >> 2) * 2 + x2];
  }
  if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
  if (na >= 0) return na;
  if (nb >= 0) return nb;
  return 0;
}

// ---------------------------------------------------------------------------
// Motion reconstruction (8.4.1 with MBAFF neighbor scaling)
// ---------------------------------------------------------------------------

static void median3_mf(const int16_t a[2], const int16_t b[2],
                       const int16_t c[2], int16_t out[2]) {
  for (int k = 0; k < 2; k++) {
    int x = a[k], y = b[k], z = c[k];
    out[k] =
        (int16_t)(std::max(std::min(x, y), std::min(std::max(x, y), z)));
  }
}

void EntropyDecoder::median_pred_mf(int list, int ref, int x0, int y0, int w,
                                    int h, int part_kind, int16_t* pred) {
  CellRef A = cell_mf(list, 4 * x0 - 1, 4 * y0);
  CellRef B = cell_mf(list, 4 * x0, 4 * y0 - 1);
  CellRef C = cell_mf(list, 4 * (x0 + w), 4 * y0 - 1);
  if (!C.avail) C = cell_mf(list, 4 * x0 - 1, 4 * y0 - 1);

  auto uses = [&](const CellRef& r) {
    return r.avail && !r.intra && r.ref >= 0;
  };
  auto matches = [&](const CellRef& r) { return uses(r) && r.ref == ref; };

  if (part_kind == 1 && matches(B)) { pred[0] = B.mv[0]; pred[1] = B.mv[1]; return; }
  if (part_kind == 2 && matches(A)) { pred[0] = A.mv[0]; pred[1] = A.mv[1]; return; }
  if (part_kind == 3 && matches(A)) { pred[0] = A.mv[0]; pred[1] = A.mv[1]; return; }
  if (part_kind == 4 && matches(C)) { pred[0] = C.mv[0]; pred[1] = C.mv[1]; return; }

  if (!B.avail && !C.avail && A.avail) {
    pred[0] = uses(A) ? A.mv[0] : 0;
    pred[1] = uses(A) ? A.mv[1] : 0;
    return;
  }
  int m = matches(A) + matches(B) + matches(C);
  if (m == 1) {
    const CellRef& r = matches(A) ? A : (matches(B) ? B : C);
    pred[0] = r.mv[0];
    pred[1] = r.mv[1];
    return;
  }
  int16_t ma[2] = {uses(A) ? A.mv[0] : (int16_t)0,
                   uses(A) ? A.mv[1] : (int16_t)0};
  int16_t mb[2] = {uses(B) ? B.mv[0] : (int16_t)0,
                   uses(B) ? B.mv[1] : (int16_t)0};
  int16_t mc[2] = {uses(C) ? C.mv[0] : (int16_t)0,
                   uses(C) ? C.mv[1] : (int16_t)0};
  median3_mf(ma, mb, mc, pred);
}

void EntropyDecoder::spatial_direct_mf(int* ref_out, int16_t mv_out[2][2]) {
  // 8.4.1.2.2 ref selection + 16x16 median, neighbor data scaled into
  // the current MB's sampling by cell_mf.
  CellRef nb[2][3];
  for (int list = 0; list < 2; list++) {
    nb[list][0] = cell_mf(list, -1, 0);
    nb[list][1] = cell_mf(list, 0, -1);
    nb[list][2] = cell_mf(list, 16, -1);
  }
  bool b_avail = nb[0][1].avail;
  bool c_avail = nb[0][2].avail;
  if (!c_avail) {
    for (int list = 0; list < 2; list++)
      nb[list][2] = cell_mf(list, -1, -1);
    c_avail = nb[0][2].avail;
  }
  for (int list = 0; list < 2; list++) {
    auto uses = [&](const CellRef& n) {
      return n.avail && !n.intra && n.ref >= 0;
    };
    int ref = -1;
    for (int k = 0; k < 3; k++)
      if (uses(nb[list][k]))
        ref = ref < 0 ? nb[list][k].ref : std::min(ref, (int)nb[list][k].ref);
    ref_out[list] = ref;
    mv_out[list][0] = mv_out[list][1] = 0;
    if (ref < 0) continue;
    auto match = [&](const CellRef& n) { return uses(n) && n.ref == ref; };
    if (!b_avail && !c_avail && nb[list][0].avail) {
      if (uses(nb[list][0])) {
        mv_out[list][0] = nb[list][0].mv[0];
        mv_out[list][1] = nb[list][0].mv[1];
      }
      continue;
    }
    int m = match(nb[list][0]) + match(nb[list][1]) + match(nb[list][2]);
    if (m == 1) {
      const CellRef& r = match(nb[list][0])
                             ? nb[list][0]
                             : (match(nb[list][1]) ? nb[list][1] : nb[list][2]);
      mv_out[list][0] = r.mv[0];
      mv_out[list][1] = r.mv[1];
      continue;
    }
    int16_t ma[2] = {uses(nb[list][0]) ? nb[list][0].mv[0] : (int16_t)0,
                     uses(nb[list][0]) ? nb[list][0].mv[1] : (int16_t)0};
    int16_t mb2[2] = {uses(nb[list][1]) ? nb[list][1].mv[0] : (int16_t)0,
                      uses(nb[list][1]) ? nb[list][1].mv[1] : (int16_t)0};
    int16_t mc[2] = {uses(nb[list][2]) ? nb[list][2].mv[0] : (int16_t)0,
                     uses(nb[list][2]) ? nb[list][2].mv[1] : (int16_t)0};
    median3_mf(ma, mb2, mc, mv_out[list]);
  }
  if (ref_out[0] < 0 && ref_out[1] < 0) {
    ref_out[0] = ref_out[1] = 0;
    mv_out[0][0] = mv_out[0][1] = mv_out[1][0] = mv_out[1][1] = 0;
  }
}

void EntropyDecoder::col_motion_mf(int cx4, int cy4, bool* ok, int* refidx,
                                   int16_t mv[2]) {
  *ok = false;
  *refidx = -1;
  mv[0] = mv[1] = 0;
  if (!dpb_valid_ || l1_.empty()) return;
  const RefPic* col = l1_[0];
  int p = cur_addr_ >> 1;
  int px = p % mb_w_, py = p / mb_w_;
  int member = cur_addr_ & 1;
  int gx8 = cx4 >> 1, gy8 = cy4 >> 1;
  int ccol = gx8 ? 3 : 0;  // corner cell column (direct_8x8_inference)
  size_t mbidx;
  int crow;  // cell row within the colocated MB
  if (col->mbaff) {
    if ((size_t)p * 2 + 1 >= col->field.size()) return;
    bool col_field = col->field[(size_t)p * 2] != 0;
    // Field-of-colPic selection by POC proximity (8.4.1.2.2: the field
    // of RefPicList1[0] closest in order count to the current
    // field/frame; ties pick the bottom — measured against libavcodec,
    // whose x264 streams carry delta_pic_order_cnt_bottom = -1, making
    // the bottom field the closer one for future references).
    auto col_parity = [&](int32_t curpoc) -> int {
      return std::abs(col->poc - curpoc) >= std::abs(col->poc_bot - curpoc)
                 ? 1
                 : 0;
    };
    if (cur_field_ == col_field) {
      mbidx = (size_t)p * 2 + member;  // same-parity member
      crow = gy8 ? 3 : 0;
    } else if (!cur_field_) {
      // Current frame member over a field-coded colocated pair: field
      // member by POC proximity (8.4.1.2.2 colPic selection; frame poc
      // = min of its field pocs), field row (strip row)/2.
      int r = 16 * member + (gy8 ? 12 : 0);
      mbidx = (size_t)p * 2 + col_parity(std::min(cur_poc_, cur_poc_bot_));
      crow = (r >> 1) >> 2;
    } else {
      // Current field member over a frame-coded colocated pair: the
      // same-parity corner strip rows {member, 24+member} land in frame
      // member r>=16 with row (r&15)>>2.
      int r = (gy8 ? 24 : 0) + member;
      int m2 = r >= 16 ? 1 : 0;
      mbidx = (size_t)p * 2 + m2;
      crow = (r & 15) >> 2;
    }
  } else {
    // Colocated picture on the raster frame grid (progressive picture
    // of a mixed-coding stream).
    if (!cur_field_) {
      mbidx = (size_t)(py * 2 + member) * mb_w_ + px;
      crow = gy8 ? 3 : 0;
    } else {
      int r = (gy8 ? 24 : 0) + member;  // strip row of the corner cell
      mbidx = (size_t)(py * 2 + (r >> 4)) * mb_w_ + px;
      crow = (r & 15) >> 2;
    }
  }
  if (mbidx >= col->inter_ok.size()) return;
  *ok = true;
  if (!col->inter_ok[mbidx]) return;  // intra/undecoded: refidx stays -1
  int ci;
  if (col->cells == 4) {
    // Corners-only snapshot (progressive picture stored under
    // direct_8x8_inference; reachable only from mixed-coding streams):
    // snap the mapped row to the nearest stored corner.
    ci = ((crow >= 2 ? 1 : 0) << 1) | (ccol ? 1 : 0);
  } else {
    ci = crow * 4 + ccol;
  }
  const int8_t* rp = &col->ref4[mbidx * 2 * col->cells];
  const int16_t* mp = &col->mv4[mbidx * 4 * col->cells];
  int lx = rp[ci] >= 0 ? 0 : (rp[col->cells + ci] >= 0 ? 1 : -1);
  if (lx < 0) return;
  *refidx = rp[lx * col->cells + ci];
  // mvCol is returned UNSCALED: the only consumer is the spatial
  // colZeroFlag test (8.4.1.2.2), which examines the colocated MV in
  // its own coding units — the vertMvScale Frm_To_Fld / Fld_To_Frm
  // adjustment belongs to TEMPORAL direct (8.4.1.2.3), which this path
  // never takes. Scaling before the |mvCol| <= 1 test flipped the
  // colZero decision exactly at the threshold (colocated mv_y of +-2
  // frame units read by a field MB, or +-1 field units read by a frame
  // MB) — caught per cell by the MV-revealing-neighbor corpus
  // (tools/sep_gen.py scenario_mbaff_reveal) against libavcodec, and
  // the source of the old "13 of 540" pair-sum disagreement bound.
  mv[0] = (int16_t)mp[(lx * col->cells + ci) * 2];
  mv[1] = (int16_t)mp[(lx * col->cells + ci) * 2 + 1];
}

void EntropyDecoder::derive_direct_mf(MbCtx* cur, int x0, int y0, int w,
                                      int h) {
  // B-direct for MBAFF: spatial prediction (8.4.1.2.2) with the colZero
  // refinement via the MBAFF colocated mapping above. Temporal direct
  // degrades to the same spatial prediction (x264 forces spatial for
  // interlaced encodes; the temporal MBAFF scaling is not modeled) —
  // parse sync never depends on any of this.
  int sref[2];
  int16_t smv[2][2];
  spatial_direct_mf(sref, smv);
  // colZeroFlag additionally requires RefPicList1[0] to be a SHORT-term
  // reference picture (8.4.1.2.2) — same gate as the progressive path's
  // col_short (entdec.cc:1739); long-term colocated pictures force
  // colZero = 0.
  bool need_colzero =
      sh_.direct_spatial_mv_pred && dpb_valid_ && !l1_.empty() &&
      !l1_[0]->longterm &&
      ((sref[0] == 0 && (smv[0][0] | smv[0][1])) ||
       (sref[1] == 0 && (smv[1][0] | smv[1][1])));
  if (trace_level_mf() >= 3)
    fprintf(stderr,
            "DDmf addr=%d fld=%d part(%d,%d %dx%d) sref=%d/%d smv=(%d,%d)/"
            "(%d,%d) colzero=%d\n",
            cur_addr_, (int)cur_field_, x0, y0, w, h, sref[0], sref[1],
            smv[0][0], smv[0][1], smv[1][0], smv[1][1], (int)need_colzero);
  if (need_colzero) {
    // Per 8x8 group (direct_8x8_inference is mandatory when
    // frame_mbs_only is 0, so direct parts are 8x8-aligned).
    for (int gy = 0; gy < h; gy += 2)
      for (int gx = 0; gx < w; gx += 2) {
        bool cok;
        int cref;
        int16_t cmv[2];
        col_motion_mf(x0 + gx, y0 + gy, &cok, &cref, cmv);
        bool col_zero = cok && cref == 0 && cmv[0] >= -1 && cmv[0] <= 1 &&
                        cmv[1] >= -1 && cmv[1] <= 1;
        if (trace_level_mf() >= 3)
          fprintf(stderr, "  CZmf grp(%d,%d) cok=%d cref=%d cmv=(%d,%d) -> %d\n",
                  x0 + gx, y0 + gy, (int)cok, cref, cmv[0], cmv[1],
                  (int)col_zero);
        int gh = std::min(2, h - gy), gw = std::min(2, w - gx);
        for (int yy = 0; yy < gh; yy++)
          for (int xx = 0; xx < gw; xx++) {
            int ci = (y0 + gy + yy) * 4 + x0 + gx + xx;
            for (int lx = 0; lx < 2; lx++) {
              if (sref[lx] < 0) {
                cur->ref4[lx][ci] = -1;
                continue;
              }
              bool zero = col_zero && sref[lx] == 0;
              cur->ref4[lx][ci] = (int8_t)sref[lx];
              cur->mv4[lx][ci][0] = zero ? 0 : smv[lx][0];
              cur->mv4[lx][ci][1] = zero ? 0 : smv[lx][1];
              cur->mvd4[lx][ci][0] = cur->mvd4[lx][ci][1] = 0;
            }
          }
        for (int lx = 0; lx < 2; lx++)
          if (sref[lx] >= 0) {
            bool zero = col_zero && sref[lx] == 0;
            if (!zero) {
              cur->mv_sum[0] += gh * gw * std::abs((int)smv[lx][0]);
              cur->mv_sum[1] += gh * gw * std::abs((int)smv[lx][1]);
              cur->mv_ssum[0] += gh * gw * (int)smv[lx][0];
              cur->mv_ssum[1] += gh * gw * (int)smv[lx][1];
            }
            cur->mv_cells += (uint8_t)(gh * gw);
          }
      }
    return;
  }
  if (x0 == 0 && y0 == 0 && w == 4 && h == 4) {
    cur->uniform = 1;
    for (int lx = 0; lx < 2; lx++) {
      cur->uniform_ref[lx] = (int8_t)sref[lx];
      cur->uniform_mv[lx][0] = sref[lx] < 0 ? 0 : smv[lx][0];
      cur->uniform_mv[lx][1] = sref[lx] < 0 ? 0 : smv[lx][1];
    }
  } else {
    for (int yy = 0; yy < h; yy++)
      for (int xx = 0; xx < w; xx++) {
        int ci = (y0 + yy) * 4 + x0 + xx;
        for (int lx = 0; lx < 2; lx++) {
          if (sref[lx] < 0) {
            cur->ref4[lx][ci] = -1;
            continue;
          }
          cur->ref4[lx][ci] = (int8_t)sref[lx];
          cur->mv4[lx][ci][0] = smv[lx][0];
          cur->mv4[lx][ci][1] = smv[lx][1];
          cur->mvd4[lx][ci][0] = cur->mvd4[lx][ci][1] = 0;
        }
      }
  }
  for (int lx = 0; lx < 2; lx++)
    if (sref[lx] >= 0) {
      cur->mv_sum[0] += w * h * std::abs((int)smv[lx][0]);
      cur->mv_sum[1] += w * h * std::abs((int)smv[lx][1]);
      cur->mv_ssum[0] += w * h * (int)smv[lx][0];
      cur->mv_ssum[1] += w * h * (int)smv[lx][1];
      cur->mv_cells += (uint8_t)(w * h);
    }
}

void EntropyDecoder::reconstruct_inter_mf(MbCtx* cur, PartList& parts) {
  for (auto& pp : parts) {
    if (pp.direct) {
      derive_direct_mf(cur, pp.x0, pp.y0, pp.w, pp.h);
      continue;
    }
    for (int list = 0; list < 2; list++) {
      if (!(pp.list_mask & (1 << list))) {
        for (int yy = 0; yy < pp.h; yy++)
          for (int xx = 0; xx < pp.w; xx++)
            cur->ref4[list][(pp.y0 + yy) * 4 + pp.x0 + xx] = -1;
        continue;
      }
      int16_t pred[2] = {0, 0};
      median_pred_mf(list, pp.ref[list], pp.x0, pp.y0, pp.w, pp.h, pp.kind,
                     pred);
      int16_t mvx = (int16_t)(pred[0] + pp.mvd[list][0]);
      int16_t mvy = (int16_t)(pred[1] + pp.mvd[list][1]);
      if (trace_level_mf() >= 3)
        fprintf(stderr,
                "EXmf addr=%d fld=%d part(%d,%d %dx%d k%d) L%d ref=%d "
                "pred=(%d,%d) mvd=(%d,%d) -> (%d,%d)\n",
                cur_addr_, (int)cur_field_, pp.x0, pp.y0, pp.w, pp.h,
                pp.kind, list, pp.ref[list], pred[0], pred[1],
                pp.mvd[list][0], pp.mvd[list][1], mvx, mvy);
      cur->mv_sum[0] += pp.w * pp.h * std::abs((int)mvx);
      cur->mv_sum[1] += pp.w * pp.h * std::abs((int)mvy);
      cur->mv_ssum[0] += pp.w * pp.h * (int)mvx;
      cur->mv_ssum[1] += pp.w * pp.h * (int)mvy;
      cur->mv_cells += (uint8_t)(pp.w * pp.h);
      for (int yy = 0; yy < pp.h; yy++)
        for (int xx = 0; xx < pp.w; xx++) {
          int ci = (pp.y0 + yy) * 4 + pp.x0 + xx;
          cur->ref4[list][ci] = (int8_t)pp.ref[list];
          cur->mv4[list][ci][0] = mvx;
          cur->mv4[list][ci][1] = mvy;
        }
    }
  }
}

// MB-completion epilogue: field macroblocks carry vertical MVs in field
// units (half vertical resolution); double the exported y sums so the
// metadata is in frame qpel units regardless of per-pair coding.
void EntropyDecoder::finish_mb_mbaff(MbCtx* cur) {
  if (cur->field_flag) {
    cur->mv_sum[1] *= 2;
    cur->mv_ssum[1] *= 2;
  }
  // Cb/Cr slices of a separate-plane stream parse for conformance
  // only; the DPB motion snapshot (feeding plane-0 direct modes) and
  // the exported metadata are the LUMA plane, as in finish_mb.
  if (plane_off_) return;
  if (snap_armed_) snap_mb(cur);
}

void EntropyDecoder::process_skip_mbaff(MbCtx* cur, bool p_slice) {
  cur->decoded = 1;
  cur->skip = 1;
  cur->mb_class = MB_SKIP;
  cur->direct_mask = 0xffff;
  if (p_slice) {
    CellRef A = cell_mf(0, -1, 0);
    CellRef B = cell_mf(0, 0, -1);
    int16_t mv[2] = {0, 0};
    bool zero = !A.avail || !B.avail ||
                (!A.intra && A.ref == 0 && A.mv[0] == 0 && A.mv[1] == 0) ||
                (!B.intra && B.ref == 0 && B.mv[0] == 0 && B.mv[1] == 0);
    if (!zero) median_pred_mf(0, 0, 0, 0, 4, 4, 0, mv);
    cur->uniform = 1;
    cur->uniform_ref[0] = 0;
    cur->uniform_ref[1] = -1;
    cur->uniform_mv[0][0] = mv[0];
    cur->uniform_mv[0][1] = mv[1];
    cur->uniform_mv[1][0] = cur->uniform_mv[1][1] = 0;
    cur->mv_sum[0] += 16 * std::abs((int)mv[0]);
    cur->mv_sum[1] += 16 * std::abs((int)mv[1]);
    cur->mv_ssum[0] += 16 * (int)mv[0];
    cur->mv_ssum[1] += 16 * (int)mv[1];
    cur->mv_cells += 16;
  } else {
    derive_direct_mf(cur, 0, 0, 4, 4);
  }
  finish_mb_mbaff(cur);
}

// ---------------------------------------------------------------------------
// CABAC macroblock layer (7.3.5, MBAFF contexts)
// ---------------------------------------------------------------------------

int EntropyDecoder::parse_mb_mbaff(MbCtx* cur) {
  bool b_slice = sh_.type == SLICE_B;
  bool p_slice = sh_.type == SLICE_P;
  bool i_slice = !b_slice && !p_slice;
  resid_field_ = cur_field_;  // Table 9-34/9-43 field context rows

  // MB-level neighbors for the contexts that read coarse per-MB flags
  // (mb_type, intra_chroma_mode, transform_8x8, cbp_chroma): the
  // macroblocks containing the samples directly left of and above the
  // current MB's origin.
  nba_ = mbaff_loc(-1, 0, 16, 16).mb;
  nbb_ = mbaff_loc(0, -1, 16, 16).mb;

  int intra_code = -1;
  int p_type = -1, b_type = -1;
  if (i_slice) {
    intra_code = cabac_mb_type_i(3, true, 0, 0);
  } else if (p_slice) {
    p_type = cabac_mb_type_p();
    if (p_type >= 5) intra_code = p_type - 5;
  } else {
    b_type = cabac_mb_type_b(0, 0);
    if (b_type >= 23) intra_code = b_type - 23;
  }

  cur->decoded = 1;
  if (intra_code == 25) {
    cabac_.reinit_at(cabac_.pcm_data_pos() + pcm_sample_bits());
    mark_pcm(cur);
    last_qp_delta_ = 0;
    finish_mb_mbaff(cur);
    return cabac_.overrun() ? -6 : 0;
  }

  int cbp_luma = 0, cbp_chroma = 0;
  bool intra = intra_code >= 0;
  cur->intra = intra;
  PartList parts;

  // ChromaArrayType, not chroma_format_idc: each plane of a
  // separate-plane stream parses as monochrome (7.4.2.1.1).
  int cfi = chroma_array_type();
  if (intra) {
    cur->mb_class = MB_INTRA;
    if (intra_code == 0) {
      cur->intra_nxn = 1;
      if (active_pps_->transform_8x8_mode)
        cur->t8x8 = cabac_transform_8x8(0, 0);
      int n = cur->t8x8 ? 4 : 16;
      for (int i = 0; i < n; i++) {
        if (!cabac_.decision(68)) {
          cabac_.decision(69);
          cabac_.decision(69);
          cabac_.decision(69);
        }
      }
      if (cfi == 1 || cfi == 2)
        cur->chroma_mode = cabac_intra_chroma_mode(0, 0);
    } else {
      cur->i16 = 1;
      int v = intra_code - 1;
      cbp_chroma = (v / 4) % 3;
      cbp_luma = (v >= 12) ? 0xf : 0;
      if (cfi == 1 || cfi == 2)
        cur->chroma_mode = cabac_intra_chroma_mode(0, 0);
    }
  } else if (p_slice) {
    int sub[4] = {0, 0, 0, 0};
    if (p_type == 3)
      for (int i = 0; i < 4; i++) sub[i] = cabac_sub_mb_type_p();
    build_parts_p(p_type, sub, cur, parts);
  } else {
    int sub[4] = {0, 0, 0, 0};
    if (b_type == 22)
      for (int i = 0; i < 4; i++) sub[i] = cabac_sub_mb_type_b();
    build_parts_b(b_type, sub, cur, parts);
  }

  // ---- inter prediction syntax: refs then mvds ----
  if (!intra && !parts.empty()) {
    for (int list = 0; list < 2; list++) {
      int lbit = 1 << list;
      // Field macroblocks index per-field reference lists, which hold
      // twice the frame entries (8.4.2.1) — ref_idx is present from
      // one active FRAME reference up.
      int active_refs = (list == 0 ? sh_.num_ref_idx_l0 : sh_.num_ref_idx_l1)
                        << (cur_field_ ? 1 : 0);
      int last_i8 = -1, last_ref = 0;
      for (auto& pp : parts) {
        if (pp.direct || !(pp.list_mask & lbit)) continue;
        int i8 = (pp.y0 >= 2 ? 2 : 0) + (pp.x0 >= 2 ? 1 : 0);
        bool is_sub = cur->mb_class == MB_INTER_8X8;
        int r;
        if (is_sub && i8 == last_i8) {
          r = last_ref;
        } else {
          r = 0;
          if (active_refs > 1) r = cabac_ref_idx_mf(list, pp.x0, pp.y0);
          last_i8 = i8;
          last_ref = r;
        }
        pp.ref[list] = r;
        for (int yy = 0; yy < pp.h; yy++)
          for (int xx = 0; xx < pp.w; xx++)
            cur->ref4[list][(pp.y0 + yy) * 4 + pp.x0 + xx] = (int8_t)r;
      }
    }
    for (int list = 0; list < 2; list++) {
      int lbit = 1 << list;
      for (auto& pp : parts) {
        if (pp.direct || !(pp.list_mask & lbit)) continue;
        cabac_mvd_pair_mf(list, pp.x0, pp.y0, pp.mvd[list]);
        for (int yy = 0; yy < pp.h; yy++)
          for (int xx = 0; xx < pp.w; xx++) {
            int ci = (pp.y0 + yy) * 4 + pp.x0 + xx;
            cur->mvd4[list][ci][0] = (int16_t)pp.mvd[list][0];
            cur->mvd4[list][ci][1] = (int16_t)pp.mvd[list][1];
            cur->ref4[list][ci] = (int8_t)pp.ref[list];
          }
      }
    }
  }

  // ---- coded_block_pattern / transform size ----
  bool sub8x8_ok = sub_parts_8x8_ok(parts, cur);
  if (!intra || cur->intra_nxn) {
    if (!cur->i16 && !cur->intra_nxn) {
      cbp_luma = cabac_cbp_luma_mf();
      cbp_chroma = (cfi == 1 || cfi == 2) ? cabac_cbp_chroma(0, 0) : 0;
      cur->cbp_luma = (uint8_t)cbp_luma;
      cur->cbp_chroma = (uint8_t)cbp_chroma;
      if (cbp_luma && active_pps_->transform_8x8_mode && !cur->intra_nxn &&
          sub8x8_ok && (b_type != 0 || active_sps_->direct_8x8_inference)) {
        cur->t8x8 = cabac_transform_8x8(0, 0);
      }
    } else if (cur->intra_nxn) {
      cbp_luma = cabac_cbp_luma_mf();
      cbp_chroma = (cfi == 1 || cfi == 2) ? cabac_cbp_chroma(0, 0) : 0;
      cur->cbp_luma = (uint8_t)cbp_luma;
      cur->cbp_chroma = (uint8_t)cbp_chroma;
    }
  }
  if (cur->i16) {
    if (cfi == 3) cbp_chroma = 0;
    cur->cbp_luma = (uint8_t)cbp_luma;
    cur->cbp_chroma = (uint8_t)cbp_chroma;
  }

  // ---- residual ----
  int nnz = 0;
  bool have_residual = cbp_luma || cbp_chroma || cur->i16;
  if (have_residual) {
    int dq = cabac_qp_delta();
    last_qp_delta_ = dq;
    int planes = cfi == 3 ? 3 : 1;
    for (int pl = 0; pl < planes; pl++) {
      int cat_dc = pl == 0 ? 0 : (pl == 1 ? 6 : 10);
      int cat_i16ac = pl == 0 ? 1 : (pl == 1 ? 7 : 11);
      int cat_4x4 = pl == 0 ? 2 : (pl == 1 ? 8 : 12);
      int cat_8x8 = pl == 0 ? 5 : (pl == 1 ? 9 : 13);
      if (cur->i16) {
        int cbf = 0;
        nnz += residual_block(cat_dc, 16, cbf_ctx_luma_dc_mf(cur, pl), true,
                              &cbf);
        if (cbf) cur->cbf_luma_dc |= 1u << pl;
      }
      for (int i8 = 0; i8 < 4; i8++) {
        if (!((cbp_luma >> i8) & 1)) continue;
        if (cur->t8x8) {
          int cbf = 0;
          bool has_cbf = cfi == 3;
          int inc = has_cbf ? cbf_ctx_luma8x8_mf(cur, i8, pl) : 0;
          int n8 = residual_block(cat_8x8, 64, inc, has_cbf, &cbf);
          nnz += n8;
          if (cbf) {
            for (int i4 = 0; i4 < 4; i4++) {
              int blk = blk_raster_mf(i8, i4);
              cur->cbf_luma[pl] |= 1u << blk;
              cur->nnz4[pl][blk] = (uint8_t)std::min(n8 / 4, 16);
            }
          }
        } else {
          for (int i4 = 0; i4 < 4; i4++) {
            int blk = blk_raster_mf(i8, i4);
            int cbf = 0;
            int nb;
            if (cur->i16) {
              nb = residual_block(cat_i16ac, 15,
                                  cbf_ctx_luma4x4_mf(cur, blk, pl), true,
                                  &cbf);
            } else {
              nb = residual_block(cat_4x4, 16,
                                  cbf_ctx_luma4x4_mf(cur, blk, pl), true,
                                  &cbf);
            }
            nnz += nb;
            cur->nnz4[pl][blk] = (uint8_t)nb;
            if (cbf) cur->cbf_luma[pl] |= 1u << blk;
          }
        }
      }
    }
    if (cfi == 1 || cfi == 2) {
      if (cbp_chroma) {
        for (int comp = 0; comp < 2; comp++) {
          int cbf = 0;
          nnz += residual_block(3, ch_dc_coeffs(),
                                cbf_ctx_chroma_dc_mf(cur, comp), true, &cbf);
          if (cbf) cur->cbf_chroma_dc |= 1u << comp;
        }
      }
      if (cbp_chroma == 2) {
        for (int comp = 0; comp < 2; comp++) {
          for (int blk = 0; blk < ch_ac_blocks(); blk++) {
            int cbf = 0;
            int nb = residual_block(4, 15,
                                    cbf_ctx_chroma_ac_mf(cur, comp, blk),
                                    true, &cbf);
            nnz += nb;
            cur->nnzc[comp][blk] = (uint8_t)nb;
            if (cbf) cur->cbf_chroma_ac[comp] |= 1u << blk;
          }
        }
      }
    }
  } else {
    last_qp_delta_ = 0;
  }
  cur->nnz_total = (uint16_t)nnz;
  if (!intra) reconstruct_inter_mf(cur, parts);
  finish_mb_mbaff(cur);
  return cabac_.overrun() ? -6 : 0;
}

// ---------------------------------------------------------------------------
// Slice data (7.3.4, MBAFF pair loop)
// ---------------------------------------------------------------------------

int EntropyDecoder::decode_slice_mbaff_cabac() {
  bool b_slice = sh_.type == SLICE_B;
  bool p_slice = sh_.type == SLICE_P;
  bool i_slice = !b_slice && !p_slice;
  int total = mb_w_ * mb_h_;
  int addr = sh_.first_mb_in_slice * 2;  // CurrMbAddr (7.3.4)

  while (addr + 1 < total) {
    int pair = addr >> 1;
    int px = pair % mb_w_, py = pair / mb_w_;
    MbCtx* top = &mbs_[plane_off_ + addr];
    MbCtx* bot = &mbs_[plane_off_ + addr + 1];
    top->reset(gen_, slice_id_, /*zero_nnz=*/false);
    bot->reset(gen_, slice_id_, /*zero_nnz=*/false);

    // 7.4.4 inference: until mb_field_decoding_flag is parsed (and
    // permanently for fully-skipped pairs), the pair's flag is the left
    // pair's, else the above pair's, else 0.
    bool field = false;
    {
      MbCtx* lp = px > 0 ? &mbs_[plane_off_ + addr - 2] : nullptr;
      MbCtx* ap =
          py > 0 ? &mbs_[plane_off_ + ((size_t)(py - 1) * mb_w_ + px) * 2]
                 : nullptr;
      if (lp && lp->gen == gen_ && lp->decoded && lp->slice_id == slice_id_)
        field = lp->field_flag;
      else if (ap && ap->gen == gen_ && ap->decoded &&
               ap->slice_id == slice_id_)
        field = ap->field_flag;
    }
    cur_field_ = field;
    top->field_flag = field;
    bot->field_flag = field;

    bool top_skip = false, bot_skip = false, bot_skip_known = false;
    if (!i_slice) {
      cur_addr_ = addr;
      top_skip = cabac_mb_skip_mf(b_slice);
    }
    if (top_skip) {
      // Top skipped: the next syntax element is the bottom's
      // mb_skip_flag; mb_field_decoding_flag follows only if the bottom
      // is coded (7.3.4). Both skip contexts evaluate with the inferred
      // field value, like the flag-not-yet-decoded rule prescribes.
      cur_addr_ = addr + 1;
      bot_skip = cabac_mb_skip_mf(b_slice);
      bot_skip_known = true;
      if (!bot_skip) field = cabac_field_flag_mf(px, py) != 0;
    } else {
      field = cabac_field_flag_mf(px, py) != 0;
    }
    cur_field_ = field;
    top->field_flag = field;
    bot->field_flag = field;

    // Top macroblock.
    cur_addr_ = addr;
    if (top_skip) {
      process_skip_mbaff(top, p_slice);
      last_qp_delta_ = 0;
    } else {
      int rc = parse_mb_mbaff(top);
      if (rc) return rc;
      if (trace_enabled())
        fprintf(stderr, "mb %d (%d,%d) mbaff top field=%d cls=%d bitpos=%zu\n",
                addr, px, py, (int)field, (int)top->mb_class,
                cabac_.bit_pos());
    }
    if (cabac_.overrun()) return -6;
    // No end_of_slice_flag after even addresses (7.3.4).

    // Bottom macroblock.
    cur_addr_ = addr + 1;
    if (!i_slice && !bot_skip_known) bot_skip = cabac_mb_skip_mf(b_slice);
    if (bot_skip) {
      process_skip_mbaff(bot, p_slice);
      last_qp_delta_ = 0;
    } else {
      int rc = parse_mb_mbaff(bot);
      if (rc) return rc;
      if (trace_enabled())
        fprintf(stderr, "mb %d (%d,%d) mbaff bot field=%d cls=%d bitpos=%zu\n",
                addr + 1, px, py, (int)field, (int)bot->mb_class,
                cabac_.bit_pos());
    }
    if (cabac_.overrun()) return -6;
    if (cabac_.terminate()) break;
    addr += 2;
  }
  return cabac_.overrun() ? -6 : 0;
}

// ---------------------------------------------------------------------------
// CAVLC slice data + macroblock layer (9.2 with MBAFF nC mapping)
// ---------------------------------------------------------------------------

int EntropyDecoder::parse_mb_mbaff_cavlc(BitReader& br, MbCtx* cur) {
  bool b_slice = sh_.type == SLICE_B;
  bool p_slice = sh_.type == SLICE_P;
  bool i_slice = !b_slice && !p_slice;

  int code = (int)br.read_ue();
  int intra_code = -1, p_type = -1, b_type = -1;
  if (i_slice) {
    intra_code = code;
  } else if (p_slice) {
    if (code >= 5)
      intra_code = code - 5;
    else
      p_type = code;
  } else {
    if (code >= 23)
      intra_code = code - 23;
    else
      b_type = code;
  }
  cur->decoded = 1;
  if (intra_code == 25) {
    while (!br.byte_aligned()) br.read_bit();
    br.skip(pcm_sample_bits());
    mark_pcm(cur);
    finish_mb_mbaff(cur);
    return br.overrun() ? -6 : 0;
  }
  if (intra_code > 25) return -6;

  int cbp_luma = 0, cbp_chroma = 0;
  bool intra = intra_code >= 0;
  cur->intra = intra;
  PartList parts;

  // ChromaArrayType, not chroma_format_idc: each plane of a
  // separate-plane stream parses as monochrome (7.4.2.1.1).
  int cfi = chroma_array_type();
  if (intra) {
    cur->mb_class = MB_INTRA;
    if (intra_code == 0) {
      cur->intra_nxn = 1;
      if (active_pps_->transform_8x8_mode) cur->t8x8 = br.read_bit();
      int n = cur->t8x8 ? 4 : 16;
      for (int i = 0; i < n; i++) {
        if (!br.read_bit()) br.read_bits(3);
      }
      if (cfi == 1 || cfi == 2) cur->chroma_mode = (uint8_t)br.read_ue();
    } else {
      cur->i16 = 1;
      int v = intra_code - 1;
      cbp_chroma = cfi == 3 ? 0 : (v / 4) % 3;
      cbp_luma = (v >= 12) ? 0xf : 0;
      if (cfi == 1 || cfi == 2) cur->chroma_mode = (uint8_t)br.read_ue();
    }
  } else if (p_slice) {
    int sub[4] = {0, 0, 0, 0};
    if (p_type == 3 || p_type == 4)
      for (int i = 0; i < 4; i++) {
        sub[i] = (int)br.read_ue();
        if (sub[i] > 3) return -6;
      }
    build_parts_p(p_type, sub, cur, parts);
  } else {
    int sub[4] = {0, 0, 0, 0};
    if (b_type == 22)
      for (int i = 0; i < 4; i++) {
        sub[i] = (int)br.read_ue();
        if (sub[i] > 12) return -6;
      }
    build_parts_b(b_type, sub, cur, parts);
  }

  if (!intra && !parts.empty()) {
    bool ref0_forced = (p_type == 4);
    for (int list = 0; list < 2; list++) {
      int lbit = 1 << list;
      int active_refs = (list == 0 ? sh_.num_ref_idx_l0 : sh_.num_ref_idx_l1)
                        << (cur_field_ ? 1 : 0);
      int last_i8 = -1, last_ref = 0;
      for (auto& pp : parts) {
        if (pp.direct || !(pp.list_mask & lbit)) continue;
        int i8 = (pp.y0 >= 2 ? 2 : 0) + (pp.x0 >= 2 ? 1 : 0);
        bool is_sub = cur->mb_class == MB_INTER_8X8;
        int r;
        if (is_sub && i8 == last_i8) {
          r = last_ref;
        } else {
          r = 0;
          if (active_refs > 1 && !ref0_forced) {
            if (active_refs == 2)
              r = br.read_bit() ^ 1;  // te(v) with range 1
            else
              r = (int)br.read_ue();
          }
          last_i8 = i8;
          last_ref = r;
        }
        pp.ref[list] = r;
        for (int yy = 0; yy < pp.h; yy++)
          for (int xx = 0; xx < pp.w; xx++)
            cur->ref4[list][(pp.y0 + yy) * 4 + pp.x0 + xx] = (int8_t)r;
      }
    }
    for (int list = 0; list < 2; list++) {
      int lbit = 1 << list;
      for (auto& pp : parts) {
        if (pp.direct || !(pp.list_mask & lbit)) continue;
        pp.mvd[list][0] = br.read_se();
        pp.mvd[list][1] = br.read_se();
      }
    }
  }

  bool sub8x8_ok = sub_parts_8x8_ok(parts, cur);
  if (!cur->i16) {
    uint32_t me = br.read_ue();
    if (cfi == 0 || cfi == 3) {
      if (me >= 16) return -6;
      cbp_luma = (cur->intra_nxn ? kGolombToIntra4x4CbpGray
                                 : kGolombToInterCbpGray)[me];
    } else {
      if (me >= 48) return -6;
      cbp_luma =
          (cur->intra_nxn ? kGolombToIntra4x4Cbp : kGolombToInterCbp)[me];
    }
    cbp_chroma = cbp_luma >> 4;
    cbp_luma &= 0xf;
    cur->cbp_luma = (uint8_t)cbp_luma;
    cur->cbp_chroma = (uint8_t)cbp_chroma;
    if (cbp_luma && active_pps_->transform_8x8_mode && !cur->intra_nxn &&
        sub8x8_ok && (b_type != 0 || active_sps_->direct_8x8_inference)) {
      cur->t8x8 = br.read_bit();
    }
  } else {
    cur->cbp_luma = (uint8_t)cbp_luma;
    cur->cbp_chroma = (uint8_t)cbp_chroma;
  }

  int nnz = 0;
  bool have_residual = cbp_luma || cbp_chroma || cur->i16;
  if (have_residual) {
    br.read_se();  // mb_qp_delta
    int planes = cfi == 3 ? 3 : 1;
    for (int pl = 0; pl < planes; pl++) {
      if (cur->i16) {
        int n = cavlc_residual(br, nc_luma_mf(cur, 0, pl), 16);
        if (n < 0) return -6;
        nnz += n;
        if (n > 0) cur->cbf_luma_dc |= 1u << pl;
      }
      for (int i8 = 0; i8 < 4; i8++) {
        if (!((cbp_luma >> i8) & 1)) continue;
        for (int i4 = 0; i4 < 4; i4++) {
          int blk = blk_raster_mf(i8, i4);
          int n = cavlc_residual(br, nc_luma_mf(cur, blk, pl),
                                 cur->i16 ? 15 : 16);
          if (n < 0) return -6;
          nnz += n;
          cur->nnz4[pl][blk] = (uint8_t)n;
          if (n) cur->cbf_luma[pl] |= 1u << blk;
        }
      }
    }
    if (cfi == 1 || cfi == 2) {
      int dc_nc = active_sps_->chroma_format_idc == 2 ? -2 : -1;
      if (cbp_chroma) {
        for (int comp = 0; comp < 2; comp++) {
          int n = cavlc_residual(br, dc_nc, ch_dc_coeffs());
          if (n < 0) return -6;
          nnz += n;
          if (n) cur->cbf_chroma_dc |= 1u << comp;
        }
      }
      if (cbp_chroma == 2) {
        for (int comp = 0; comp < 2; comp++) {
          for (int blk = 0; blk < ch_ac_blocks(); blk++) {
            int n = cavlc_residual(br, nc_chroma_mf(cur, comp, blk), 15);
            if (n < 0) return -6;
            nnz += n;
            cur->nnzc[comp][blk] = (uint8_t)n;
            if (n) cur->cbf_chroma_ac[comp] |= 1u << blk;
          }
        }
      }
    }
  }
  cur->nnz_total = (uint16_t)nnz;
  if (!intra) reconstruct_inter_mf(cur, parts);
  finish_mb_mbaff(cur);
  return br.overrun() ? -6 : 0;
}

int EntropyDecoder::decode_slice_mbaff_cavlc(BitReader& br) {
  // 7.3.4 for CAVLC: mb_skip_run counts MACROBLOCKS (pairs can split
  // across a run boundary); mb_field_decoding_flag is present before a
  // coded macroblock when CurrMbAddr is even or the preceding MB was
  // skipped. A skipped TOP macroblock cannot be finished until its
  // pair's flag is known (the flag arrives with the coded bottom, or is
  // the 7.4.4 inference when the bottom is skipped too) — it is
  // deferred and completed at flag resolution, which by construction
  // happens before any later macroblock reads it as a neighbor.
  bool p_slice = sh_.type == SLICE_P;
  bool i_slice = sh_.type != SLICE_P && sh_.type != SLICE_B;
  int total = mb_w_ * mb_h_;
  int addr = sh_.first_mb_in_slice * 2;
  bool more = true;
  bool prev_skipped = false;
  int deferred_top = -1;

  auto inferred_field = [&](int pair) -> bool {
    int px = pair % mb_w_, py = pair / mb_w_;
    MbCtx* lp = px > 0 ? &mbs_[plane_off_ + ((size_t)pair - 1) * 2] : nullptr;
    MbCtx* ap =
        py > 0 ? &mbs_[plane_off_ + ((size_t)(py - 1) * mb_w_ + px) * 2]
               : nullptr;
    if (lp && lp->gen == gen_ && lp->decoded && lp->slice_id == slice_id_)
      return lp->field_flag;
    if (ap && ap->gen == gen_ && ap->decoded && ap->slice_id == slice_id_)
      return ap->field_flag;
    return false;
  };
  auto do_skip = [&](int a, bool field) {
    MbCtx* m = &mbs_[plane_off_ + a];
    m->reset(gen_, slice_id_, /*zero_nnz=*/true);
    m->field_flag = field;
    cur_addr_ = a;
    cur_field_ = field;
    process_skip_mbaff(m, p_slice);
  };

  while (more && addr < total) {
    prev_skipped = false;
    if (!i_slice) {
      uint32_t run = br.read_ue();
      if (br.overrun()) return -6;
      prev_skipped = run > 0;
      while (run > 0 && addr < total) {
        if ((addr & 1) == 0) {
          if (run >= 2) {  // whole pair inside the run: inferred flag
            bool f = inferred_field(addr >> 1);
            do_skip(addr, f);
            do_skip(addr + 1, f);
            addr += 2;
            run -= 2;
          } else {  // run ends on a top — defer until the flag resolves
            deferred_top = addr;
            addr++;
            run--;
          }
        } else {  // skipped bottom: top was coded, pair flag is known
          do_skip(addr, mbs_[plane_off_ + (addr & ~1)].field_flag != 0);
          addr++;
          run--;
        }
      }
      more = br.more_rbsp_data();
      if (!more || addr >= total) break;
    }

    // Coded macroblock at addr.
    bool field;
    if ((addr & 1) == 0) {
      field = br.read_bit() != 0;
    } else if (prev_skipped) {
      field = br.read_bit() != 0;
      if (deferred_top >= 0) {
        do_skip(deferred_top, field);
        deferred_top = -1;
      }
    } else {
      field = mbs_[plane_off_ + (addr & ~1)].field_flag != 0;
    }
    MbCtx* cur = &mbs_[plane_off_ + addr];
    cur->reset(gen_, slice_id_, /*zero_nnz=*/true);
    cur->field_flag = field;
    // Keep the pair's flag readable through the TOP member (mbaff_loc
    // resolves pair coding via the top) even when the top is the
    // not-yet-completed deferred case — cannot happen here (deferred
    // tops resolve above), but a coded TOP must publish before its
    // bottom parses, which this write is.
    cur_addr_ = addr;
    cur_field_ = field;
    int rc = parse_mb_mbaff_cavlc(br, cur);
    if (rc) return rc;
    addr++;
    more = br.more_rbsp_data();
  }
  if (deferred_top >= 0)  // trailing skip run ended on a top
    do_skip(deferred_top, inferred_field(deferred_top >> 1));
  return br.overrun() ? -6 : 0;
}

}  // namespace cova
