#!/usr/bin/env python3
"""DPB-feature validation stream generator: long-term references,
MMCO 1-4/6, ref-list modification op 2, and POC type 1.

x264 never emits long-term references, adaptive marking beyond MMCO 1,
or POC type 1, so the decoder's DPB emulation for these paths had no
stream source — they used to degrade to the plain-spatial fallback.
This tool hand-writes small CONFORMING monochrome CAVLC streams
(chroma_format_idc 0, profile 100 — the same lavc-accepted shape as
sep_gen's mono twins) that exercise each feature, and libavcodec is
the direct oracle: per-MB |mv|-sum equality via export_mvs proves
- reference-list construction (short-terms + long-term tail, 8.2.4.2),
  since median MV prediction keys on neighbor ref-idx equality,
- marking (8.2.5: sliding-window exemption, MMCO 1-4/6, IDR
  long_term_reference_flag), since a mismarked DPB reorders lists,
- POC type 1 (8.2.1.2), since temporal-direct MV scaling divides by
  POC distances,
- the 8.4.1.2.3 long-term scaling bypass and the 8.4.1.2.2 short-term
  colZero requirement.

Stream container: .lp264 (4-byte LE length prefix per AU), consumed by
entdec_selftest / mvdump; tests in tests/test_codec.py TestDpbFeatures.
"""

from __future__ import annotations

import pathlib
import struct
import sys

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from paff_gen import BitWriter, nal  # noqa: E402
from sep_gen import _w_mb_b, _w_mb_p, _write_mb_i_mono  # noqa: E402


def sps_rbsp_dpb(mb_w: int, mb_h: int, *, max_ref: int = 4,
                 log2_max_frame_num: int = 8, log2_max_poc_lsb: int = 8,
                 poc_type: int = 0,
                 poc1_offsets: list[int] | None = None,
                 offset_for_non_ref_pic: int = 0,
                 offset_top_bottom: int = 0) -> bytes:
    """Monochrome High SPS with a configurable pic_order_cnt_type."""
    w = BitWriter()
    w.u(8, 100)  # High (parses chroma_format_idc; 0 = monochrome)
    w.u(8, 0)
    w.u(8, 30)
    w.ue(0)      # seq_parameter_set_id
    w.ue(0)      # chroma_format_idc = 0
    w.ue(0)      # bit_depth_luma_minus8
    w.ue(0)      # bit_depth_chroma_minus8
    w.u(1, 0)    # qpprime_y_zero_transform_bypass_flag
    w.u(1, 0)    # seq_scaling_matrix_present_flag
    w.ue(log2_max_frame_num - 4)
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(log2_max_poc_lsb - 4)
    elif poc_type == 1:
        w.u(1, 0)  # delta_pic_order_always_zero_flag
        w.se(offset_for_non_ref_pic)
        w.se(offset_top_bottom)
        offs = poc1_offsets or []
        w.ue(len(offs))
        for o in offs:
            w.se(o)
    w.ue(max_ref)
    w.u(1, 0)    # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)    # frame_mbs_only_flag
    w.u(1, 1)    # direct_8x8_inference_flag
    w.u(1, 0)
    w.u(1, 0)
    w.trailing_bits()
    return w.rbsp()


def pps_rbsp() -> bytes:
    w = BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 0)  # entropy_coding_mode_flag (CAVLC)
    w.u(1, 0)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(1, 0)
    w.u(2, 0)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 0)
    w.u(1, 0)
    w.u(1, 0)
    w.trailing_bits()
    return w.rbsp()


class DpbEncoder:
    """One CAVLC slice per frame AU, with full dec_ref_pic_marking and
    ref_pic_list_modification control."""

    def __init__(self, mb_w: int, mb_h: int, *, max_ref: int = 4,
                 poc_type: int = 0, log2_max_frame_num: int = 8,
                 poc1_offsets: list[int] | None = None,
                 offset_for_non_ref_pic: int = 0):
        self.mb_w = mb_w
        self.mb_h = mb_h
        self.frame_mbs = mb_w * mb_h
        self.poc_type = poc_type
        self.log2_max_frame_num = log2_max_frame_num
        self.log2_max_poc_lsb = 8
        self.aus: list[bytes] = []
        self._param_sets = nal(3, 7, sps_rbsp_dpb(
            mb_w, mb_h, max_ref=max_ref,
            log2_max_frame_num=log2_max_frame_num,
            log2_max_poc_lsb=self.log2_max_poc_lsb,
            poc_type=poc_type, poc1_offsets=poc1_offsets,
            offset_for_non_ref_pic=offset_for_non_ref_pic,
        )) + nal(3, 8, pps_rbsp())
        self._idr_id = 0

    def picture(self, mbs: list[dict], *, slice_type: str, frame_num: int,
                poc: int = 0, idr: bool = False, lt_flag: bool = False,
                mmco: list[tuple] | None = None,
                list_mod: dict | None = None,
                nref: int = 1, nref1: int = 1, ref: bool = True,
                direct_spatial: bool = True):
        """poc: pic_order_cnt_lsb (type 0) / delta_pic_order_cnt[0]
        (type 1, se coded) / ignored (type 2). mmco: list of MMCO ops
        as tuples — (1, diff_minus1), (2, long_term_pic_num),
        (3, diff_minus1, long_term_frame_idx), (4, max_lt_idx_plus1),
        (6, long_term_frame_idx). list_mod: {list_index: [(idc, value),
        ...]} with idc 0/1 = abs_diff_pic_num_minus1, 2 =
        long_term_pic_num."""
        assert len(mbs) == self.frame_mbs
        p_slice = slice_type == "P"
        b_slice = slice_type == "B"
        w = BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(0 if p_slice else 1 if b_slice else 2)
        w.ue(0)  # pic_parameter_set_id
        w.u(self.log2_max_frame_num, frame_num)
        if idr:
            w.ue(self._idr_id)
            self._idr_id ^= 1
        if self.poc_type == 0:
            w.u(self.log2_max_poc_lsb, poc)
        elif self.poc_type == 1:
            w.se(poc)  # delta_pic_order_cnt[0]
        if b_slice:
            w.u(1, 1 if direct_spatial else 0)
        if p_slice or b_slice:
            w.u(1, 1)  # num_ref_idx_active_override_flag
            w.ue(nref - 1)
            if b_slice:
                w.ue(nref1 - 1)
        mods = list_mod or {}
        if p_slice or b_slice:
            self._write_mods(w, mods.get(0))
        if b_slice:
            self._write_mods(w, mods.get(1))
        if ref:
            if idr:
                w.u(1, 0)  # no_output_of_prior_pics_flag
                w.u(1, 1 if lt_flag else 0)  # long_term_reference_flag
            elif mmco:
                w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag
                for op in mmco:
                    w.ue(op[0])
                    if op[0] in (1, 2, 3, 4, 6):
                        w.ue(op[1])
                    if op[0] == 3:
                        w.ue(op[2])
                w.ue(0)  # end of ops
            else:
                w.u(1, 0)  # sliding window
        w.se(0)  # slice_qp_delta
        # ---- slice data (CAVLC, monochrome syntax) ----
        if p_slice or b_slice:
            run = 0
            for mb in mbs:
                if mb["k"] == "skip":
                    run += 1
                    continue
                w.ue(run)
                run = 0
                if b_slice:
                    _w_mb_b(w, mb, nref, nref1)
                else:
                    _w_mb_p(w, mb, nref)
            if run:
                w.ue(run)
        else:
            for mb in mbs:
                _write_mb_i_mono(w, mb, off=0)
        w.trailing_bits()
        au = nal(2 if ref else 0, 5 if idr else 1, w.rbsp())
        if not self.aus:
            au = self._param_sets + au
        self.aus.append(au)

    @staticmethod
    def _write_mods(w: BitWriter, mods):
        if not mods:
            w.u(1, 0)  # ref_pic_list_modification_flag
            return
        w.u(1, 1)
        for idc, val in mods:
            w.ue(idc)
            w.ue(val)
        w.ue(3)  # end of modifications

    def write(self, path: str):
        with open(path, "wb") as f:
            for au in self.aus:
                f.write(struct.pack("<I", len(au)) + au)


# --------------------------------------------------------------------------
# Scenarios
# --------------------------------------------------------------------------


def _grid(enc: DpbEncoder, fill):
    return [fill(i) for i in range(enc.frame_mbs)]


def _i_fill(enc):
    return _grid(enc, lambda i: {"k": "i4"} if i % 2 else {"k": "i16",
                                                           "pred": 2})


def _p_ref(r, mv):
    """Whole-frame p16 grid pointing at ref idx r (skip sprinkled)."""
    def mk(i):
        if i % 3 == 2:
            return {"k": "skip"}
        return {"k": "p16", "mvd": mv, "ref": r}
    return mk


def scenario_lt_idr(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """IDR marked long-term (long_term_reference_flag); max_ref=3 with
    shorts sliding past it. Later P frames address the pinned IDR via
    the long-term list tail (8.2.4.2.1) — the window must never evict
    it (8.2.5.3)."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=3)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True, lt_flag=True)
    # Four P refs slide through the 2 remaining short-term slots.
    for f in range(1, 5):
        enc.picture(_grid(enc, _p_ref(0, (2, -1))), slice_type="P",
                    frame_num=f, poc=2 * f, nref=1)
    # nref=3: list = [short fn4, short fn3, LONG-TERM idr]; explicit
    # MVs on every entry, incl. the long-term at idx 2.
    def mix(i):
        r = i % 4
        if r == 3:
            return {"k": "skip"}
        return {"k": "p16", "mvd": (r + 1, -r), "ref": r}
    enc.picture(_grid(enc, mix), slice_type="P", frame_num=5, poc=10,
                nref=3)
    # Observability: P MV export alone cannot distinguish list
    # CONTENTS (median prediction keys on ref indices) — a temporal
    # B's colocated mapping can. Its colPic is the P above; colocated
    # cells referencing idx 2 map to the LONG-TERM IDR (poc 0, the
    # scaling-bypass path), idx 0/1 to the shorts (scaled).
    def bmix(i):
        return {"k": "bdirect"} if i % 2 else {"k": "skip"}
    # poc ABOVE the last output picture: libavcodec discards a B whose
    # display slot already passed (observed: a poc-9 B after P5/poc-10
    # was output never leaves lavc's reorderer). colPic is still l1[0]
    # = P5, whose colocated cells reference the long-term.
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=6, poc=12,
                ref=False, direct_spatial=False, nref=1, nref1=1)
    return enc


def scenario_mmco36(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """MMCO 3 (short->long mid-stream), MMCO 6 (current->long), MMCO 2
    (unmark long), MMCO 4 (shrink MaxLongTermFrameIdx), with multi-ref
    P reads across every transition."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=4)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True)
    # P1: plain. P2: converts P1 (PicNum diff 0 -> frame_num 1) to
    # long-term idx 0 via MMCO 3.
    enc.picture(_grid(enc, _p_ref(0, (1, 1))), slice_type="P",
                frame_num=1, poc=2)
    enc.picture(_grid(enc, _p_ref(0, (0, 2))), slice_type="P",
                frame_num=2, poc=4, mmco=[(3, 0, 0)])
    # P3: stores ITSELF long-term idx 1 (MMCO 6); reads shorts + longs.
    def mix3(i):
        r = i % 3
        return {"k": "p16", "mvd": (r, 1 - r), "ref": r} if r < 3 else \
            {"k": "skip"}
    enc.picture(_grid(enc, mix3), slice_type="P", frame_num=3, poc=6,
                nref=3, mmco=[(6, 1)])
    # P4: reads [short fn3? no - fn3 became long] list: shorts desc
    # (fn2... wait fn2 short, fn0 IDR short) + longs (idx0=fn1,
    # idx1=fn3). nref=4 touches all.
    def mix4(i):
        r = i % 4
        return {"k": "p16", "mvd": (1, r - 2), "ref": r}
    enc.picture(_grid(enc, mix4), slice_type="P", frame_num=4, poc=8,
                nref=4)
    # P5: unmark long idx 0 (MMCO 2), then shrink max idx to none via
    # MMCO 4 with plus1=1 (keeps idx<=0: none left after unmarking...
    # order: op2 removes idx0, op4(plus1=1) -> max 0 keeps idx1? no,
    # idx1 > 0 is dropped). Reads only shorts afterwards.
    enc.picture(_grid(enc, _p_ref(0, (3, 0))), slice_type="P",
                frame_num=5, poc=10, mmco=[(2, 0), (4, 1)])
    enc.picture(_grid(enc, _p_ref(1, (0, 3))), slice_type="P",
                frame_num=6, poc=12, nref=2)
    return enc


def scenario_lt_listmod(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """Ref-list modification op 2: the long-term picture is pulled to
    index 0 (8.2.4.3.2), shifting the shorts — median prediction's
    ref-equality tests see the remap."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=3)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True, lt_flag=True)
    enc.picture(_grid(enc, _p_ref(0, (1, -1))), slice_type="P",
                frame_num=1, poc=2)
    enc.picture(_grid(enc, _p_ref(0, (2, 0))), slice_type="P",
                frame_num=2, poc=4)
    def mix(i):
        r = i % 3
        return {"k": "p16", "mvd": (r - 1, r), "ref": r}
    enc.picture(_grid(enc, mix), slice_type="P", frame_num=3, poc=6,
                nref=3, list_mod={0: [(2, 0)]})
    # Observability (see scenario_lt_idr): the colocated P's MODIFIED
    # list must be what the temporal B's poc mapping reads — its idx 0
    # is the remapped long-term (poc 0), idx 1/2 the shifted shorts.
    def bmix(i):
        return {"k": "bdirect"} if i % 2 else {"k": "skip"}
    # poc above the last output picture (see scenario_lt_idr).
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=4, poc=8,
                ref=False, direct_spatial=False, nref=1, nref1=1)
    return enc


def scenario_lt_temporal(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """B temporal direct whose colocated motion references the
    LONG-TERM picture: the mapped refIdxL0 is long-term, so the MV
    scaling is bypassed (8.4.1.2.3 — mvL0 = mvCol, mvL1 = 0)."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=3)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True, lt_flag=True)
    # P1 at poc 8: every inter MB references the LONG-TERM IDR (its
    # only list entry) with a nonzero MV.
    enc.picture(_grid(enc, _p_ref(0, (6, -4))), slice_type="P",
                frame_num=1, poc=8)
    # Non-ref B at poc 4, temporal direct: colPic = P1; the colocated
    # cells point at the long-term IDR -> unscaled copy.
    def bmix(i):
        r = i % 3
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "bdirect"}
        return {"k": "b16", "kind": "bi", "mvd": [(1, 0), (0, 1)],
                "ref": [0, 0]}
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=4,
                ref=False, direct_spatial=False, nref=1, nref1=1)
    # And a spatial-direct B over the same DPB: colZero must be OFF
    # when RefPicList1[0] is... list1[0] is the short-term P1 here, so
    # colZero applies normally — covered for contrast.
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=6,
                ref=False, direct_spatial=True, nref=1, nref1=1)
    return enc


def scenario_poc1(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """POC type 1 (8.2.1.2): a 2-entry offset cycle and negative
    offset_for_non_ref_pic; IPBB with temporal direct — the direct-MV
    scale factors divide by the derived POC distances."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=4, poc_type=1,
                     poc1_offsets=[6, 6], offset_for_non_ref_pic=-2)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True)
    enc.picture(_grid(enc, _p_ref(0, (4, -2))), slice_type="P",
                frame_num=1, poc=0)
    def bmix(i):
        r = i % 3
        if r == 0:
            return {"k": "bdirect"}
        if r == 1:
            return {"k": "skip"}
        return {"k": "b16", "kind": "l0", "mvd": [(2, 2)], "ref": [0]}
    # Non-ref Bs between I (expected 0) and P1 (expected 6):
    # abs_fn - 1 after the non-ref adjustment, plus the -2 non-ref
    # offset and per-slice deltas -1/+1.
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=-1,
                ref=False, direct_spatial=False)
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=1,
                ref=False, direct_spatial=False)
    # Another cycle step: P2 expected 12.
    enc.picture(_grid(enc, _p_ref(0, (0, 4))), slice_type="P",
                frame_num=2, poc=0)
    return enc


def scenario_poc1_wrap(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """POC type 1 across a frame_num wrap (log2_max_frame_num = 4):
    FrameNumOffset accumulation (8.2.1.2 step 1) keeps expected POC
    monotonic; temporal direct after the wrap still scales right."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=2, poc_type=1,
                     poc1_offsets=[4], log2_max_frame_num=4)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True)
    for f in range(1, 20):  # frame_num wraps at 16
        enc.picture(_grid(enc, _p_ref(0, (1 + f % 3, -1))),
                    slice_type="P", frame_num=f % 16, poc=0)
    def bmix(i):
        return {"k": "bdirect"} if i % 2 else {"k": "skip"}
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=4, poc=-2,
                ref=False, direct_spatial=False)
    return enc


def scenario_mmco5(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """MMCO 5 (8.2.5.4.5): mid-stream reset — everything unmarked, the
    resetting picture renormalized to poc 0 / frame_num 0, and the
    POC-type-0 prev msb/lsb state re-based. The closing temporal B's
    scale factors divide by post-reset POC distances, so a mis-rebased
    DPB is observable."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=4)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True)
    enc.picture(_grid(enc, _p_ref(0, (2, 2))), slice_type="P",
                frame_num=1, poc=2)
    # The reset: coded poc 4, stored as poc 0 / frame_num 0; DPB now
    # holds only this picture.
    enc.picture(_grid(enc, _p_ref(0, (1, -3))), slice_type="P",
                frame_num=2, poc=4, mmco=[(5,)])
    # Post-reset pictures code frame_num/poc in the re-based domain
    # (PrevRefFrameNum inferred 0, prev poc lsb 0).
    enc.picture(_grid(enc, _p_ref(0, (5, -2))), slice_type="P",
                frame_num=1, poc=2)
    def bmix(i):
        return {"k": "bdirect"} if i % 2 else {"k": "skip"}
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=4,
                ref=False, direct_spatial=False, nref=1, nref1=1)
    return enc


def scenario_mmco5_poc(mb_w: int = 6, mb_h: int = 6) -> DpbEncoder:
    """MMCO 5's POC-state behavior, pinned to libavcodec (== the
    reference's FFmpeg): the resetting picture KEEPS its coded POC and
    prevPicOrderCnt is NOT re-based (a spec-literal reading would zero
    both). The post-reset P codes lsb 130 — re-based state would wrap
    it negative — and the closing temporal B's colPic comes out of the
    l0==l1 first-entry swap, so either deviation flips the colocated
    picture and the scale factors."""
    enc = DpbEncoder(mb_w, mb_h, max_ref=4)
    enc.picture(_i_fill(enc), slice_type="I", frame_num=0, poc=0,
                idr=True)
    enc.picture(_grid(enc, _p_ref(0, (2, 2))), slice_type="P",
                frame_num=1, poc=2)
    enc.picture(_grid(enc, _p_ref(0, (1, -3))), slice_type="P",
                frame_num=2, poc=4, mmco=[(5,)])
    enc.picture(_grid(enc, _p_ref(0, (4, 0))), slice_type="P",
                frame_num=1, poc=130)
    def bmix(i):
        return {"k": "bdirect"} if i % 2 else {"k": "skip"}
    enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2, poc=134,
                ref=False, direct_spatial=False, nref=1, nref1=1)
    return enc


SCENARIOS = {
    "lt_idr": scenario_lt_idr,
    "mmco5": scenario_mmco5,
    "mmco5_poc": scenario_mmco5_poc,
    "mmco36": scenario_mmco36,
    "lt_listmod": scenario_lt_listmod,
    "lt_temporal": scenario_lt_temporal,
    "poc1": scenario_poc1,
    "poc1_wrap": scenario_poc1_wrap,
}


def main(argv):
    if len(argv) < 3 or argv[1] not in SCENARIOS:
        sys.stderr.write(
            f"usage: {argv[0]} {{{'|'.join(SCENARIOS)}}} OUT.lp264 "
            "[mb_w mb_h]\n")
        return 2
    args = [int(a) for a in argv[3:5]]
    enc = SCENARIOS[argv[1]](*args)
    enc.write(argv[2])
    print(f"{argv[2]}: {len(enc.aus)} frame AUs, "
          f"{enc.mb_w}x{enc.mb_h} MBs")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
