#!/usr/bin/env python3
"""separate_colour_plane validation stream generator.

x264 cannot emit separate_colour_plane_flag=1 (no offline encoder
can), so — exactly like PAFF (paff_gen.py) — the validation corpus is
first-party: hand-written CONFORMING High 4:4:4 Predictive streams
whose three colour planes are coded as independent monochrome pictures
(H.264 7.4.2.1.1, ChromaArrayType 0), one access unit = three slices
with colour_plane_id 0/1/2.

Validation strategy (tests/test_codec.py TestSeparatePlanes).
libavcodec CANNOT be the direct oracle here: it rejects
separate_colour_plane outright ("separate color planes are not
supported", h264_ps.c) — this decoder exceeds libavcodec's
conformance on this feature. The differential anchor is the MONO
TWIN: every scenario is emitted twice from the same MB payloads —
(a) the separate-plane stream (3 plane slices per AU, profile 244)
and (b) a plain monochrome stream (chroma_format_idc 0, profile 100,
1 slice per AU) that libavcodec does decode. Each plane of (a) parses
with exactly the monochrome syntax of (b) (ChromaArrayType 0,
7.4.2.1.1) and fresh per-slice entropy contexts, so:
- plane-0 metadata exports of (a) must equal (b)'s exports BYTE FOR
  BYTE (mvdump differential; covers MV reconstruction incl. B direct
  through the plane-0 DPB snapshot);
- (b) is itself validated against libavcodec (per-MB |mv|-sum
  equality via export_mvs; the monochrome CABAC contexts are
  bin-oracle-covered by the existing x264 4:0:0 matrix);
- every scenario additionally parse-syncs to completion on the
  separate stream itself (entdec_selftest, zero failures), incl. the
  divergent-planes scenario, whose Cb/Cr payloads deliberately differ
  from luma to prove the per-plane MB-region isolation.

Reference parity: the reference's patched FFmpeg decodes any
conforming stream (/root/reference/README.md:94-114); its metadata
consumers are monochrome-agnostic (per-MB [mb_type, mv] only —
cova-rs/gst-plugins/src/metapreprocess/imp.rs:288-332), so the
exported plane for separate-plane content is luma by contract.

Stream container: .lp264 (4-byte LE length prefix per AU), the format
entdec_selftest / mvdump / diff_oracle.sh consume.
"""

from __future__ import annotations

import pathlib
import struct
import sys

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from cabac_enc import FieldSliceCabac  # noqa: E402
from paff_gen import (  # noqa: E402
    _PCM_LUMA,
    BitWriter,
    _write_mb_b,
    _write_mb_p,
    nal,
)


def sps_rbsp_sep(mb_w: int, mb_h: int, *, max_ref: int = 4,
                 log2_max_frame_num: int = 8,
                 log2_max_poc_lsb: int = 8,
                 separate: bool = True,
                 interlaced: bool = False,
                 mbaff: bool = False) -> bytes:
    """separate=True: High 4:4:4 Predictive with separate colour
    planes. separate=False: the MONO TWIN — chroma_format_idc 0 under
    plain High, the same ChromaArrayType-0 syntax in a stream shape
    libavcodec accepts (it rejects separate_colour_plane outright:
    "separate color planes are not supported", h264_ps.c) — the
    lavc-anchored half of the differential validation.
    interlaced=True: frame_mbs_only_flag=0 (PAFF field pictures
    permitted; map units become field MB rows, 7.4.2.1.1).
    mbaff=True (implies interlaced): mb_adaptive_frame_field_flag=1 —
    frame pictures are MBAFF pair-coded (7.3.4)."""
    assert not mbaff or interlaced
    assert not interlaced or mb_h % 2 == 0
    w = BitWriter()
    w.u(8, 244 if separate else 100)  # High 4:4:4 Predictive / High
    w.u(8, 0)    # constraint flags + reserved
    w.u(8, 30)   # level_idc
    w.ue(0)      # seq_parameter_set_id
    w.ue(3 if separate else 0)  # chroma_format_idc
    if separate:
        w.u(1, 1)  # separate_colour_plane_flag
    w.ue(0)      # bit_depth_luma_minus8
    w.ue(0)      # bit_depth_chroma_minus8
    w.u(1, 0)    # qpprime_y_zero_transform_bypass_flag
    w.u(1, 0)    # seq_scaling_matrix_present_flag
    w.ue(log2_max_frame_num - 4)
    w.ue(0)      # pic_order_cnt_type 0
    w.ue(log2_max_poc_lsb - 4)
    w.ue(max_ref)  # max_num_ref_frames
    w.u(1, 0)    # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue((mb_h // 2 if interlaced else mb_h) - 1)  # map units
    w.u(1, 0 if interlaced else 1)  # frame_mbs_only_flag
    if interlaced:
        w.u(1, 1 if mbaff else 0)  # mb_adaptive_frame_field_flag
    w.u(1, 1)    # direct_8x8_inference_flag
    w.u(1, 0)    # frame_cropping_flag
    w.u(1, 0)    # vui_parameters_present_flag
    w.trailing_bits()
    return w.rbsp()


def pps_rbsp(*, cabac: bool = False) -> bytes:
    # Identical layout to paff_gen.pps_rbsp (duplicated to keep this
    # file's parameter sets self-contained and greppable).
    w = BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1 if cabac else 0)  # entropy_coding_mode_flag
    w.u(1, 0)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)    # num_slice_groups_minus1
    w.ue(0)    # num_ref_idx_l0_default_active_minus1
    w.ue(0)    # num_ref_idx_l1_default_active_minus1
    w.u(1, 0)  # weighted_pred_flag
    w.u(2, 0)  # weighted_bipred_idc
    w.se(0)    # pic_init_qp_minus26
    w.se(0)    # pic_init_qs_minus26
    w.se(0)    # chroma_qp_index_offset
    w.u(1, 0)  # deblocking_filter_control_present_flag
    w.u(1, 0)  # constrained_intra_pred_flag
    w.u(1, 0)  # redundant_pic_cnt_present_flag
    w.trailing_bits()
    return w.rbsp()


# --------------------------------------------------------------------------
# Monochrome (ChromaArrayType 0) CAVLC macroblock writers
# --------------------------------------------------------------------------


def _write_mb_i_mono(w: BitWriter, mb: dict, off: int):
    """Intra MB with no chroma syntax: no intra_chroma_pred_mode
    (7.3.5.1), coded_block_pattern via Table 9-4's ChromaArrayType-0-
    or-3 column, I_PCM carries 256 luma samples only (7.3.5)."""
    k = mb["k"]
    if k == "pcm":
        w.ue(off + 25)
        w.align_zero()
        w.raw_bytes(_PCM_LUMA)
    elif k == "i4":
        w.ue(off + 0)
        for _ in range(16):
            w.u(1, 1)  # prev_intra4x4_pred_mode_flag
        # cbp 0 -> codeNum 1 in the gray Intra column
        # (kGolombToIntra4x4CbpGray, csrc/cavlc_tables.h).
        w.ue(1)
    elif k == "i16":
        # cbp_chroma part of the I_16x16 mb_type must be 0 (no chroma).
        w.ue(off + 1 + mb.get("pred", 0))
        w.se(0)    # mb_qp_delta
        w.u(1, 1)  # Intra16x16DCLevel: TotalCoeff 0, nC<2 coeff_token
    else:
        raise ValueError(k)


def _w_mb_p(w: BitWriter, mb: dict, nref: int):
    if mb["k"] in ("pcm", "i4", "i16"):
        _write_mb_i_mono(w, mb, off=5)
    else:
        # Inter writers emit no chroma syntax; their trailing cbp-0
        # ue(0) is codeNum 0 in the gray Inter column too
        # (kGolombToInterCbpGray[0] == 0).
        _write_mb_p(w, mb, nref)


def _w_mb_b(w: BitWriter, mb: dict, nref0: int, nref1: int):
    if mb["k"] in ("pcm", "i4", "i16"):
        _write_mb_i_mono(w, mb, off=23)
    else:
        _write_mb_b(w, mb, nref0, nref1)


# --------------------------------------------------------------------------
# Encoder: one AU = three colour-plane slices
# --------------------------------------------------------------------------


class SepEncoder:
    """Emits one access unit per FRAME picture, three slices per AU
    (colour_plane_id 0, 1, 2)."""

    def __init__(self, mb_w: int, mb_h: int, *, max_ref: int = 4,
                 cabac: bool = False, separate: bool = True,
                 interlaced: bool = False, mbaff: bool = False):
        self.mb_w = mb_w
        self.mb_h = mb_h
        self.frame_mbs = mb_w * mb_h
        self.field_mbs = mb_w * (mb_h // 2)
        self.log2_max_frame_num = 8
        self.log2_max_poc_lsb = 8
        self.aus: list[bytes] = []
        self.keys: list[bool] = []
        self.cabac = cabac
        # separate=False builds the MONO TWIN: identical payloads, one
        # slice per AU, chroma_format_idc 0 (see sps_rbsp_sep).
        self.separate = separate
        # interlaced=True permits PAFF field pictures (field()); frame
        # pictures of the same stream still go through picture().
        # mbaff=True additionally pair-codes frame pictures
        # (picture_mbaff()); its field pictures stay plain PAFF.
        self.interlaced = interlaced or mbaff
        self.mbaff = mbaff
        self._param_sets = nal(3, 7, sps_rbsp_sep(
            mb_w, mb_h, max_ref=max_ref,
            log2_max_frame_num=self.log2_max_frame_num,
            log2_max_poc_lsb=self.log2_max_poc_lsb,
            separate=separate, interlaced=self.interlaced, mbaff=mbaff,
        )) + nal(3, 8, pps_rbsp(cabac=cabac))
        self._idr_id = 0
        # CAVLC multi-slice split point (see picture()); 0 = one slice
        # per plane picture.
        self.split_at = 0

    def _slice(self, mbs: list[dict], plane: int, *, slice_type: str,
               frame_num: int, poc_lsb: int, idr: bool, nref: int,
               nref1: int, ref: bool, direct_spatial: bool,
               first_mb: int = 0, field: bool = False,
               bottom: bool = False,
               mbaff_flags: list[bool] | None = None,
               mmco: list[tuple] | None = None,
               reorder_l1: list[tuple] | None = None) -> bytes:
        p_slice = slice_type == "P"
        b_slice = slice_type == "B"
        w = BitWriter()
        w.ue(first_mb)  # first_mb_in_slice
        w.ue(0 if p_slice else 1 if b_slice else 2)  # slice_type
        w.ue(0)  # pic_parameter_set_id
        if self.separate:
            w.u(2, plane)  # colour_plane_id (7.3.3: present iff separate)
        w.u(self.log2_max_frame_num, frame_num)
        if self.interlaced:
            w.u(1, 1 if field else 0)  # field_pic_flag (7.3.3)
            if field:
                w.u(1, 1 if bottom else 0)  # bottom_field_flag
        if idr:
            w.ue(self._idr_id)
        w.u(self.log2_max_poc_lsb, poc_lsb)
        if b_slice:
            w.u(1, 1 if direct_spatial else 0)
        if p_slice or b_slice:
            w.u(1, 1)  # num_ref_idx_active_override_flag
            w.ue(nref - 1)
            if b_slice:
                w.ue(nref1 - 1)
            w.u(1, 0)  # ref_pic_list_modification_flag_l0
            if b_slice:
                # 7.3.3.1 list-1 modification: ops are (idc, value)
                # pairs — idc 0/1 abs_diff_pic_num_minus1, idc 2
                # long_term_pic_num — closed by idc 3.
                w.u(1, 1 if reorder_l1 else 0)
                for idc, val in reorder_l1 or ():
                    w.ue(idc)
                    w.ue(val)
                if reorder_l1:
                    w.ue(3)
        if ref:
            if idr:
                w.u(1, 0)  # no_output_of_prior_pics_flag
                w.u(1, 0)  # long_term_reference_flag
            else:
                # 7.3.3.3 adaptive marking: mmco ops are (op, value)
                # pairs (value unused for op 5; op 3 takes a 2-tuple
                # value (diff_minus1, lt_idx)) — closed by op 0.
                w.u(1, 1 if mmco else 0)
                for op, val in mmco or ():
                    w.ue(op)
                    if op in (1, 2, 4, 6):
                        w.ue(val)
                    elif op == 3:
                        w.ue(val[0])
                        w.ue(val[1])
                if mmco:
                    w.ue(0)
        if self.cabac and (p_slice or b_slice):
            w.ue(0)  # cabac_init_idc
        w.se(0)  # slice_qp_delta
        if self.cabac:
            assert first_mb == 0, "CABAC slices cover the whole picture"
            while not w.byte_aligned():
                w.u(1, 1)  # cabac_alignment_one_bit
            coder = FieldSliceCabac(
                self.mb_w, self.mb_h // 2 if field else self.mb_h,
                slice_type, nref0=nref, nref1=nref1, qp=26, init_idc=0,
                field=field, mono=True)
            w.raw_bytes(coder.encode(mbs))
            return nal(2 if ref else 0, 5 if idr else 1, w.rbsp())
        # ---- slice data (CAVLC) ----
        if mbaff_flags is not None:
            # MBAFF pair loop (7.3.4): macroblocks arrive in PAIR
            # address order (addr = 2*pair + member); mb_skip_run
            # counts macroblocks and may split a pair (the decoder's
            # deferred-top machinery), mb_field_decoding_flag precedes
            # a coded macroblock when its address is even or the
            # preceding macroblock was skipped — at most once per pair.
            # Fully skipped pairs carry no flag (7.4.4 inference); the
            # caller's flags entry for such pairs is ignored by
            # construction. Field macroblocks index FIELD reference
            # lists, twice the frame length (te/ue range doubles).
            run = 0
            prev_skipped = False
            for addr, mb in enumerate(mbs):
                if (p_slice or b_slice) and mb["k"] == "skip":
                    run += 1
                    continue
                if p_slice or b_slice:
                    w.ue(run)
                    prev_skipped = run > 0
                    run = 0
                fld = bool(mbaff_flags[addr >> 1])
                if (addr & 1) == 0 or prev_skipped:
                    w.u(1, 1 if fld else 0)
                nr0 = nref << 1 if fld else nref
                nr1 = nref1 << 1 if fld else nref1
                if b_slice:
                    _w_mb_b(w, mb, nr0, nr1)
                elif p_slice:
                    _w_mb_p(w, mb, nr0)
                else:
                    _write_mb_i_mono(w, mb, off=0)
            if run:
                w.ue(run)
        elif p_slice or b_slice:
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
        return nal(2 if ref else 0, 5 if idr else 1, w.rbsp())

    def picture(self, mbs: list[dict], *, slice_type: str, frame_num: int,
                poc_lsb: int, idr: bool = False, nref: int = 1,
                nref1: int = 1, ref: bool = True,
                direct_spatial: bool = True,
                plane_mbs: list[list[dict]] | None = None):
        """Append one frame: three plane slices. plane_mbs overrides the
        per-plane payloads (default: `mbs` on all three planes, which
        keeps libavcodec's single overwrite-on-decode motion field
        comparable — see module docstring)."""
        assert not self.mbaff, \
            "frame pictures of an MBAFF stream are pair-coded: " \
            "use picture_mbaff()"
        parts = []
        # split_at: optional CAVLC multi-slice split — each plane's
        # picture becomes two slices [0, split_at) and [split_at, end),
        # emitted SLICE-MAJOR across planes (p0s0 p1s0 p2s0 p0s1 ...) so
        # the decoder's plane routing (plane_off_) switches mid-picture
        # with partially-parsed planes outstanding.
        bounds = [0, self.split_at, self.frame_mbs] if self.split_at \
            else [0, self.frame_mbs]
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            for plane in range(3 if self.separate else 1):
                pm = mbs if plane_mbs is None else plane_mbs[plane]
                assert len(pm) == self.frame_mbs, (len(pm), self.frame_mbs)
                parts.append(self._slice(
                    pm[lo:hi], plane, slice_type=slice_type,
                    frame_num=frame_num, poc_lsb=poc_lsb, idr=idr,
                    nref=nref, nref1=nref1, ref=ref,
                    direct_spatial=direct_spatial, first_mb=lo))
        if idr:
            self._idr_id ^= 1  # consecutive IDRs must differ (7.4.3)
        au = b"".join(parts)
        if not self.aus:
            au = self._param_sets + au
        self.aus.append(au)
        self.keys.append(idr)

    def picture_mbaff(self, mbs: list[dict], flags: list[bool], *,
                      slice_type: str, frame_num: int, poc_lsb: int,
                      idr: bool = False, nref: int = 1, nref1: int = 1,
                      ref: bool = True, direct_spatial: bool = True,
                      plane_mbs: list[list[dict]] | None = None,
                      plane_flags: list[list[bool]] | None = None,
                      mmco: list[tuple] | None = None,
                      reorder_l1: list[tuple] | None = None):
        """Append one MBAFF FRAME picture: three plane slices (or one
        for the mono twin), each pair-coded (7.3.4). `mbs` is in PAIR
        address order (addr = 2*(pair_y*mb_w + pair_x) + member);
        `flags` holds one mb_field_decoding_flag per pair. The MBAFF x
        separate_colour_plane combination — the decoder's last typed
        rejection, closed in round 4. plane_mbs/plane_flags override
        per-plane payloads (each plane of a separate stream is an
        independent monochrome picture, so even the pair coding modes
        may diverge across planes)."""
        assert self.mbaff and not self.cabac, \
            "MBAFF scenarios are CAVLC (FieldSliceCabac has no MBAFF " \
            "contexts; the decoder's MBAFF CABAC is x264-oracle-covered)"
        parts = []
        for plane in range(3 if self.separate else 1):
            pm = mbs if plane_mbs is None else plane_mbs[plane]
            pf = flags if plane_flags is None else plane_flags[plane]
            assert len(pm) == self.frame_mbs and len(pf) * 2 == len(pm)
            parts.append(self._slice(
                pm, plane, slice_type=slice_type, frame_num=frame_num,
                poc_lsb=poc_lsb, idr=idr, nref=nref, nref1=nref1,
                ref=ref, direct_spatial=direct_spatial, mbaff_flags=pf,
                mmco=mmco, reorder_l1=reorder_l1))
        if idr:
            self._idr_id ^= 1
        au = b"".join(parts)
        if not self.aus:
            au = self._param_sets + au
        self.aus.append(au)
        self.keys.append(idr)

    def field(self, mbs: list[dict], *, slice_type: str, bottom: bool,
              frame_num: int, poc_lsb: int, idr: bool = False,
              nref: int = 1, nref1: int = 1, ref: bool = True,
              direct_spatial: bool = True,
              plane_mbs: list[list[dict]] | None = None):
        """Append one FIELD picture (interlaced streams only): one AU =
        three plane slices (or one for the mono twin), each a field
        slice covering mb_w x mb_h/2 macroblocks — the interlaced
        separate-plane combination (PAFF x 7.4.2.1.1)."""
        assert self.interlaced, "field() needs interlaced=True"
        parts = []
        for plane in range(3 if self.separate else 1):
            pm = mbs if plane_mbs is None else plane_mbs[plane]
            assert len(pm) == self.field_mbs, (len(pm), self.field_mbs)
            parts.append(self._slice(
                pm, plane, slice_type=slice_type, frame_num=frame_num,
                poc_lsb=poc_lsb, idr=idr, nref=nref, nref1=nref1,
                ref=ref, direct_spatial=direct_spatial,
                field=True, bottom=bottom))
        if idr:
            self._idr_id ^= 1
        au = b"".join(parts)
        if not self.aus:
            au = self._param_sets + au
        self.aus.append(au)
        self.keys.append(idr)

    def write(self, path: str):
        with open(path, "wb") as f:
            for au in self.aus:
                f.write(struct.pack("<I", len(au)) + au)


# --------------------------------------------------------------------------
# Scenarios
# --------------------------------------------------------------------------


def _grid(enc: SepEncoder, fill):
    return [fill(i) for i in range(enc.frame_mbs)]


def _pred16(i: int, mb_w: int, want: int,
            slice_rows: tuple = (0,)) -> int:
    """Position-legal Intra_16x16 pred mode (8.3.3): Vertical needs the
    row above, Horizontal the column left, Plane both; DC adapts.
    slice_rows: rows where a new slice starts — the row above belongs
    to another slice, so it is unavailable for intra prediction exactly
    like the picture edge (8.3.3's availability via 6.4.9)."""
    x, y = i % mb_w, i // mb_w
    top = y in slice_rows
    if x == 0 and top:
        return 2
    if top:
        return 1 if want % 2 else 2   # Horizontal / DC only
    if x == 0:
        return 0 if want % 2 else 2   # Vertical / DC only
    return want % 4


def _i_mix(i: int, pcm_at: int = -1, mb_w: int = 6) -> dict:
    if i == pcm_at:
        return {"k": "pcm"}
    # Right/below neighbors of an I_PCM must not be I_16x16: PCM
    # contributes TotalCoeff 16 to their Intra16x16DCLevel nC (9.2.1),
    # while these hand-written streams code every DC with the nC<2
    # coeff_token '1'. I_NxN with cbp 0 parses no residual at all.
    if pcm_at >= 0 and i in (pcm_at + 1, pcm_at + mb_w):
        return {"k": "i4"}
    if i % 3 == 0:
        return {"k": "i4"}
    return {"k": "i16", "pred": _pred16(i, mb_w, i)}


def scenario_ip(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    """IDR + P frames: every P partition shape, skip runs, multi-ref,
    intra-in-P, I_PCM (luma-only samples)."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate)
    enc.picture(_grid(enc, lambda i: _i_mix(i, pcm_at=7)),
                slice_type="I", frame_num=0, poc_lsb=0, idr=True)

    def p_mix(f):
        def mk(i):
            r = (i + f) % 7
            if r == 0:
                return {"k": "skip"}
            if r == 1:
                return {"k": "p16", "mvd": (i % 5 - 2, -(i % 3)), "ref": 0}
            if r == 2:
                return {"k": "p16x8",
                        "mvd": [(2, -1), (-3, 1)], "ref": [0, min(f - 1, 1)]}
            if r == 3:
                return {"k": "p8x16",
                        "mvd": [(-1, 2), (1, -2)], "ref": [0, 0]}
            if r == 4:
                return {"k": "p8x8",
                        "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                        "ref": [0, 0, min(f - 1, 2), 0]}
            if r == 5:
                return {"k": "i4"}
            return {"k": "i16", "pred": _pred16(i, mb_w, i)}
        return mk

    for f in range(1, 5):
        enc.picture(_grid(enc, p_mix(f)), slice_type="P", frame_num=f,
                    poc_lsb=2 * f, nref=min(f, 4))
    return enc


def _b_frames(enc: SepEncoder, spatial: bool):
    """IDR, P, then non-ref B between them (decode order I P B B):
    direct modes (whole-MB and 8x8 subs), every b16/pair shape."""
    if enc.cabac:
        # The CABAC MB menu spells I_16x16 'i16r' (residual-capable);
        # cbpc must be 0 in monochrome.
        enc.picture(_grid(enc, lambda i:
                          {"k": "i4"} if i % 3 == 0 else
                          {"k": "i16r",
                           "pred": _pred16(i, enc.mb_w, i), "cbpc": 0}),
                    slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    else:
        enc.picture(_grid(enc, lambda i: _i_mix(i, mb_w=enc.mb_w)),
                    slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    enc.picture(_grid(enc, lambda i:
                      {"k": "skip"} if i % 3 else
                      {"k": "p16", "mvd": (4, -2), "ref": 0}),
                slice_type="P", frame_num=1, poc_lsb=6)

    def bmix(i):
        r = i % 6
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "bdirect"}
        if r == 2:
            return {"k": "b16", "kind": ("l0", "l1", "bi")[i % 3],
                    "mvd": [(1, -1)] * (2 if i % 3 == 2 else 1),
                    "ref": [0] * (2 if i % 3 == 2 else 1)}
        if r == 3:
            return {"k": "b16x8", "kinds": ("l0", "l1"),
                    "mvd": [[(2, 0)], [(0, 2)]], "ref": [[0], [0]]}
        if r == 4:
            return {"k": "b8x16", "kinds": ("l1", "l0"),
                    "mvd": [[(-2, 1)], [(1, -2)]], "ref": [[0], [0]]}
        return {"k": "b8x8", "sub": ["direct", "l0", "l1", "bi"],
                "mvd": [None, [(1, 1)], [(-1, 1)], [(1, 0), (0, 1)]],
                "ref": [None, [0], [0], [0, 0]]}

    for k, poc in ((2, 2), (3, 4)):
        enc.picture(_grid(enc, bmix), slice_type="B", frame_num=2,
                    poc_lsb=poc, ref=False, nref=1, nref1=1,
                    direct_spatial=spatial)


def scenario_b_spatial(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate)
    _b_frames(enc, spatial=True)
    return enc


def scenario_b_temporal(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate)
    _b_frames(enc, spatial=False)
    return enc


def scenario_diverge(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    """Planes carry DIFFERENT payloads (conforming: each plane is an
    independent monochrome picture). Parse-sync coverage for the
    per-plane MB-region isolation — not MV-comparable vs libavcodec's
    single motion field (see module docstring)."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate)
    enc.picture(_grid(enc, lambda i: _i_mix(i, pcm_at=3)),
                slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    planes = [
        _grid(enc, lambda i: {"k": "skip"} if i % 2 else
              {"k": "p16", "mvd": (1, 1), "ref": 0}),
        _grid(enc, lambda i: {"k": "p8x8",
                              "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                              "ref": [0, 0, 0, 0]} if i % 3 == 0 else
              {"k": "skip"}),
        _grid(enc, lambda i: {"k": "i4"} if i % 4 == 0 else
              {"k": "p16x8", "mvd": [(0, 2), (2, 0)], "ref": [0, 0]}),
    ]
    enc.picture(planes[0], slice_type="P", frame_num=1, poc_lsb=2,
                plane_mbs=planes)
    return enc


def scenario_cabac_ip(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    """CABAC I+P with monochrome contexts: I_NxN / I_16x16 (DC
    residual), every P shape, skips — bin-oracle adjudicated."""
    enc = SepEncoder(mb_w, mb_h, max_ref=2, cabac=True, separate=separate)
    enc.picture(_grid(enc, lambda i:
                      {"k": "i4"} if i % 2 else
                      {"k": "i16r", "pred": _pred16(i, mb_w, i),
                       "cbpc": 0,
                       "dc": [(0, 3), (2, -1)] if i % 4 == 0 else []}),
                slice_type="I", frame_num=0, poc_lsb=0, idr=True)

    def p_mix(f):
        def mk(i):
            r = (i + f) % 6
            if r == 0:
                return {"k": "skip"}
            if r == 1:
                return {"k": "p16", "mvd": (3 - i % 7, i % 5 - 2),
                        "ref": 0}
            if r == 2:
                return {"k": "p16x8", "mvd": [(2, -1), (-3, 1)],
                        "ref": [0, min(f - 1, 1)]}
            if r == 3:
                return {"k": "p8x16", "mvd": [(-1, 2), (1, -2)],
                        "ref": [0, 0]}
            if r == 4:
                return {"k": "p8x8",
                        "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                        "ref": [0, 0, 0, 0]}
            return {"k": "i4"}
        return mk

    for f in range(1, 4):
        enc.picture(_grid(enc, p_mix(f)), slice_type="P", frame_num=f,
                    poc_lsb=2 * f, nref=min(f, 2))
    return enc


def scenario_cabac_b(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    enc = SepEncoder(mb_w, mb_h, max_ref=4, cabac=True, separate=separate)
    _b_frames(enc, spatial=True)
    return enc


def scenario_cabac_resid(mb_w: int = 6, mb_h: int = 6, *, separate: bool = True) -> SepEncoder:
    """CABAC luma residual in monochrome contexts: the FRAME Table 9-34
    rows for cats 0 (I16 DC), 1 (I16 AC) and 2 (4x4), incl. the eq1/gt1
    level evolution and the >=15 EG0 escape — no chroma cats exist."""
    enc = SepEncoder(mb_w, mb_h, max_ref=2, cabac=True, separate=separate)

    def i_mix(i):
        if i % 3 == 0:
            return {"k": "i16r", "pred": _pred16(i, mb_w, i), "cbpc": 0,
                    "dc": [(0, 1), (5, -2), (15, 1)] if i % 2 else [(3, 20)]}
        return {"k": "i4"}

    enc.picture(_grid(enc, i_mix), slice_type="I", frame_num=0,
                poc_lsb=0, idr=True)

    def p_mix(i):
        r = i % 4
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "p16", "mvd": (1, -1), "ref": 0, "cbp": 0x9,
                    "coeffs": {0: [(0, 2), (1, -1)], 15: [(7, -18)]}}
        if r == 2:
            return {"k": "p8x8",
                    "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                    "ref": [0, 0, 0, 0], "cbp": 0xF,
                    "coeffs": {b: [(b % 14, 1 + b % 3)] for b in range(16)}}
        return {"k": "i4"}

    enc.picture(_grid(enc, p_mix), slice_type="P", frame_num=1,
                poc_lsb=2, nref=1)
    return enc


def scenario_multislice(mb_w: int = 6, mb_h: int = 6, *,
                        separate: bool = True) -> SepEncoder:
    """Every plane picture split into two slices, slices interleaved
    SLICE-MAJOR across planes — the decoder must keep three partially
    parsed plane regions (and their per-slice neighbor availability)
    live at once. Twin: the same payloads as a 2-slice mono stream."""
    enc2 = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate)
    split_row = mb_h // 2
    enc2.split_at = split_row * mb_w
    srows = (0, split_row)

    # The ip scenario's pictures, emitted through the splitting writer;
    # intra pred modes must treat the second slice's first row like the
    # picture edge (no cross-slice intra prediction).
    def i_mix(i):
        mb = _i_mix(i, pcm_at=7, mb_w=mb_w)
        if mb["k"] == "i16":
            mb["pred"] = _pred16(i, mb_w, i, slice_rows=srows)
        return mb

    enc2.picture(_grid(enc2, i_mix),
                 slice_type="I", frame_num=0, poc_lsb=0, idr=True)

    def p_mix(f):
        def mk(i):
            r = (i + f) % 7
            if r == 0:
                return {"k": "skip"}
            if r == 1:
                return {"k": "p16", "mvd": (i % 5 - 2, -(i % 3)), "ref": 0}
            if r == 2:
                return {"k": "p16x8",
                        "mvd": [(2, -1), (-3, 1)], "ref": [0, min(f - 1, 1)]}
            if r == 3:
                return {"k": "p8x16",
                        "mvd": [(-1, 2), (1, -2)], "ref": [0, 0]}
            if r == 4:
                return {"k": "p8x8",
                        "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                        "ref": [0, 0, min(f - 1, 2), 0]}
            if r == 5:
                return {"k": "i4"}
            return {"k": "i16",
                    "pred": _pred16(i, mb_w, i, slice_rows=srows)}
        return mk

    for f in range(1, 5):
        enc2.picture(_grid(enc2, p_mix(f)), slice_type="P", frame_num=f,
                     poc_lsb=2 * f, nref=min(f, 4))
    return enc2


# --------------------------------------------------------------------------
# Interlaced scenarios: PAFF field pictures x separate_colour_plane —
# the combination that kept a typed rejection through round 3 (no
# stream source existed). Validation is the same differential: the
# separate field stream's plane-0 exports must equal its monochrome
# PAFF twin's byte for byte, and the twin is MV-exact vs libavcodec
# (the paff_gen comparator handles field export weaving).
# --------------------------------------------------------------------------


def _fgrid(enc: SepEncoder, fill):
    return [fill(i) for i in range(enc.field_mbs)]


def scenario_field_ip(mb_w: int = 6, mb_h: int = 6, *,
                      separate: bool = True) -> SepEncoder:
    """IDR I top field (i4/i16/PCM mix), P bottom field (cross-parity
    reference), then a P field pair with partitions, skips and
    multi-ref over the 8.2.4.2.5 interleaved field lists."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     interlaced=True)
    enc.field(_fgrid(enc, lambda i: _i_mix(i, pcm_at=4, mb_w=mb_w)),
              slice_type="I", bottom=False, frame_num=0, poc_lsb=0,
              idr=True)

    def p_mix(f, nref):
        def mk(i):
            r = (i + f) % 7
            if r == 0:
                return {"k": "skip"}
            if r == 1:
                return {"k": "p16", "mvd": (i % 5 - 2, -(i % 3)),
                        "ref": i % nref}
            if r == 2:
                return {"k": "p16x8", "mvd": [(2, -1), (-3, 1)],
                        "ref": [0, (f - 1) % nref]}
            if r == 3:
                return {"k": "p8x16", "mvd": [(-1, 2), (1, -2)],
                        "ref": [0, 0]}
            if r == 4:
                return {"k": "p8x8",
                        "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                        "ref": [0, 0, min(nref - 1, 2), 0]}
            if r == 5:
                return {"k": "i4"}
            return {"k": "i16", "pred": _pred16(i, mb_w, i)}
        return mk

    enc.field(_fgrid(enc, p_mix(1, 1)), slice_type="P", bottom=True,
              frame_num=0, poc_lsb=1)
    enc.field(_fgrid(enc, p_mix(2, 2)), slice_type="P", bottom=False,
              frame_num=1, poc_lsb=2, nref=2)
    enc.field(_fgrid(enc, p_mix(3, 3)), slice_type="P", bottom=True,
              frame_num=1, poc_lsb=3, nref=3)
    return enc


def _field_b(enc: SepEncoder, spatial: bool):
    """Mirror of paff_gen._scenario_b over the separate-plane encoder:
    anchors at POC 0/1 and 8/9, a non-ref B field pair at POC 4/5 with
    direct modes (whole-MB + 8x8 subs), explicit L0/L1/Bi and
    cross-parity ref indices."""
    enc.field(_fgrid(enc, lambda i: {"k": "i4"} if i % 3 == 0 else
                     {"k": "i16", "pred": _pred16(i, enc.mb_w, i)}),
              slice_type="I", bottom=False, frame_num=0, poc_lsb=0,
              idr=True)
    enc.field(_fgrid(enc, lambda i: {"k": "p16",
                                     "mvd": ((i * 3) % 7 - 3,
                                             (i * 5) % 5 - 2)}),
              slice_type="P", bottom=True, frame_num=0, poc_lsb=1)
    enc.field(_fgrid(enc, lambda i: {"k": "skip"} if i % 3 == 0 else
                     {"k": "p16", "mvd": ((i * 7) % 9 - 4, (i * 2) % 5 - 2),
                      "ref": i % 2}),
              slice_type="P", bottom=False, frame_num=1, poc_lsb=8, nref=2)
    enc.field(_fgrid(enc, lambda i: {"k": "p16",
                                     "mvd": (1 - i % 3, i % 4 - 1),
                                     "ref": i % 3}),
              slice_type="P", bottom=True, frame_num=1, poc_lsb=9, nref=3)

    def bmix(i):
        r = i % 8
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "bdirect"}
        if r == 2:
            return {"k": "b16", "kind": "l0", "mvd": [(3, -1)],
                    "ref": [i % 2]}
        if r == 3:
            return {"k": "b16", "kind": "l1", "mvd": [(-2, 2)], "ref": [0]}
        if r == 4:
            return {"k": "b16", "kind": "bi", "mvd": [(1, 1), (-1, 3)],
                    "ref": [0, i % 2]}
        if r == 5:
            return {"k": "b16x8", "kinds": ("l0", "l1"),
                    "mvd": [[(2, 0)], [(0, -2)]], "ref": [[1], [0]]}
        if r == 6:
            return {"k": "b8x16", "kinds": ("bi", "l0"),
                    "mvd": [[(1, 0), (0, 1)], [(-1, 2)]],
                    "ref": [[0, 0], [1]]}
        return {"k": "b8x8", "sub": ["direct", "l0", "bi", "direct"],
                "mvd": [None, [(2, -2)], [(1, 1), (3, 0)], None],
                "ref": [None, [1], [0, 1], None]}

    enc.field(_fgrid(enc, bmix), slice_type="B", bottom=False,
              frame_num=2, poc_lsb=4, nref=2, nref1=2, ref=False,
              direct_spatial=spatial)
    enc.field(_fgrid(enc, lambda i: bmix(i + 3)), slice_type="B",
              bottom=True, frame_num=2, poc_lsb=5, nref=2, nref1=2,
              ref=False, direct_spatial=spatial)


def scenario_field_b_spatial(mb_w: int = 6, mb_h: int = 6, *,
                             separate: bool = True) -> SepEncoder:
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     interlaced=True)
    _field_b(enc, spatial=True)
    return enc


def scenario_field_b_temporal(mb_w: int = 6, mb_h: int = 6, *,
                              separate: bool = True) -> SepEncoder:
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     interlaced=True)
    _field_b(enc, spatial=False)
    return enc


def scenario_field_adaptive(mb_w: int = 6, mb_h: int = 6, *,
                            separate: bool = True) -> SepEncoder:
    """FRAME pictures and field pairs mixed in one interlaced
    separate-plane stream: IDR I frame, a P field pair over the frame
    reference, a P frame again — the frame-picture path of an
    interlace-capable separate stream (parses like progressive with
    plane routing)."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     interlaced=True)
    enc.picture(_grid(enc, lambda i: _i_mix(i, mb_w=mb_w)),
                slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    enc.field(_fgrid(enc, lambda i: {"k": "skip"} if i % 2 else
                     {"k": "p16", "mvd": (2, -1), "ref": 0}),
              slice_type="P", bottom=False, frame_num=1, poc_lsb=2)
    enc.field(_fgrid(enc, lambda i: {"k": "p16",
                                     "mvd": (i % 3 - 1, 1), "ref": 0}),
              slice_type="P", bottom=True, frame_num=1, poc_lsb=3)
    enc.picture(_grid(enc, lambda i: {"k": "skip"} if i % 3 else
                      {"k": "p16", "mvd": (-1, 2), "ref": 0}),
                slice_type="P", frame_num=2, poc_lsb=4)
    return enc


def scenario_field_cabac(mb_w: int = 6, mb_h: int = 6, *,
                         separate: bool = True) -> SepEncoder:
    """CABAC field pictures x monochrome contexts x separate planes:
    the FIELD Table 9-34 residual rows (cats 0-2) under ChromaArrayType
    0 — I_16x16 DC blocks, coded 4x4 luma in P fields, skips, B fields
    with direct modes."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, cabac=True,
                     separate=separate, interlaced=True)
    enc.field(_fgrid(enc, lambda i:
                     {"k": "i4"} if i % 3 == 0 else
                     {"k": "i16r", "pred": _pred16(i, mb_w, i), "cbpc": 0,
                      "dc": [(0, 3), (2, -1), (15, 1)] if i % 2 else
                            [(7, 17)]}),
              slice_type="I", bottom=False, frame_num=0, poc_lsb=0,
              idr=True)

    def p_mix(i):
        r = i % 5
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "p16", "mvd": (2, -1), "cbp": 0b1001,
                    "coeffs": {0: [(0, 1), (3, -2)], 1: [(5, 4)],
                               15: [(1, -1), (14, 2), (15, -3)]}}
        if r == 2:
            return {"k": "i16r", "pred": 2, "cbpc": 0,
                    "dc": [(1, 2), (6, -7), (13, 1)]}
        if r == 3:
            return {"k": "p16x8", "mvd": [(0, 4), (-3, 0)],
                    "cbp": 0b0110,
                    "coeffs": {2: [(0, -20)], 6: [(2, 1), (9, 1)],
                               9: [(0, 1)]}}
        return {"k": "p16", "mvd": (1, 1)}

    enc.field(_fgrid(enc, p_mix), slice_type="P", bottom=True,
              frame_num=0, poc_lsb=1)
    enc.field(_fgrid(enc, lambda i: p_mix(i + 2)), slice_type="P",
              bottom=False, frame_num=1, poc_lsb=8, nref=2)
    enc.field(_fgrid(enc, lambda i: p_mix(i + 4)), slice_type="P",
              bottom=True, frame_num=1, poc_lsb=9, nref=2)

    def bmix(i):
        r = i % 4
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "bdirect"}
        if r == 2:
            return {"k": "b16", "kind": "bi", "mvd": [(1, 1), (-1, 3)],
                    "ref": [0, i % 2]}
        return {"k": "b8x8", "sub": ["direct", "l0", "bi", "direct"],
                "mvd": [None, [(2, -2)], [(1, 1), (3, 0)], None],
                "ref": [None, [1], [0, 1], None]}

    enc.field(_fgrid(enc, bmix), slice_type="B", bottom=False,
              frame_num=2, poc_lsb=4, nref=2, nref1=2, ref=False)
    # Complementary bottom field: libavcodec only outputs woven PAIRS,
    # so a lone trailing field would never surface for MV comparison.
    enc.field(_fgrid(enc, lambda i: bmix(i + 2)), slice_type="B",
              bottom=True, frame_num=2, poc_lsb=5, nref=2, nref1=2,
              ref=False)
    return enc


# --------------------------------------------------------------------------
# MBAFF scenarios: pair-coded FRAME pictures x separate_colour_plane —
# the decoder's LAST typed rejection (rc=-4 through early round 4).
# Validation is the same mono-twin differential: the separate MBAFF
# stream's plane-0 exports must equal its monochrome MBAFF twin's byte
# for byte, and the twin is pair-sum MV-adjudicated vs libavcodec via
# TestMbaff._pair_compare (lavc decodes monochrome MBAFF CAVLC).
# CAVLC only: FieldSliceCabac has no MBAFF context derivations, and the
# decoder's MBAFF CABAC path is already bin-oracle-covered by the x264
# interlaced matrix — the NEW machinery under test here (plane routing
# through the pair path) is entropy-agnostic.
# --------------------------------------------------------------------------


def _mbaff_grid(enc: SepEncoder, fill):
    """Pair-address-order payload: fill(addr, pair, member)."""
    return [fill(a, a >> 1, a & 1) for a in range(enc.frame_mbs)]


def _mbaff_i(addr: int, pair: int, member: int) -> dict:
    # PCM at pair 2 top; every pair adjacent to it stays I_NxN (PCM
    # contributes TotalCoeff 16 to a neighboring Intra16x16DCLevel nC,
    # while these streams code every DC with the nC<2 coeff_token '1').
    # I_16x16 uses DC prediction (always available) — MBAFF neighbor
    # availability differs from progressive, DC sidesteps legality.
    if addr == 4:
        return {"k": "pcm"}
    if pair in (1, 2, 3, 8):  # neighbors of pair 2 (6 pair columns)
        return {"k": "i4"}
    if (pair + member) % 3 == 0:
        return {"k": "i16", "pred": 2}
    return {"k": "i4"}


def _mbaff_p(f: int, nref: int):
    """P payload in pair-address order: full-pair skips (7.4.4
    inferred flag), top-only and bottom-only skips (the deferred-top
    CAVLC machinery), every partition shape, intra-in-P, multiref —
    field members index the doubled FIELD lists."""
    def mk(addr, pair, member):
        r = (pair + f) % 6
        if r == 0:
            return {"k": "skip"}                      # full pair
        if r == 1 and member == 0:
            return {"k": "skip"}                      # top only
        if r == 2 and member == 1:
            return {"k": "skip"}                      # bottom only
        s = (addr + f) % 5
        if s == 0:
            return {"k": "p16", "mvd": (addr % 5 - 2, -(addr % 3)),
                    "ref": addr % nref}
        if s == 1:
            return {"k": "p16x8", "mvd": [(2, -1), (-3, 1)],
                    "ref": [0, (f - 1) % nref]}
        if s == 2:
            return {"k": "p8x16", "mvd": [(-1, 2), (1, -2)],
                    "ref": [0, 0]}
        if s == 3:
            return {"k": "p8x8",
                    "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                    "ref": [0, 0, min(nref - 1, 2), 0]}
        return {"k": "i4"}
    return mk


def _mbaff_flags(enc: SepEncoder, f: int = 0):
    # Field/frame pair mix with runs (so the 7.4.4 left-then-above
    # inference sees both values) — varies per frame f.
    return [(p + f) % 3 != 1 for p in range(enc.frame_mbs // 2)]


def scenario_mbaff_ip(mb_w: int = 6, mb_h: int = 6, *,
                      separate: bool = True) -> SepEncoder:
    """IDR I MBAFF frame (i4/i16/PCM across field and frame pairs),
    then P MBAFF frames: every skip split of a pair, every partition
    shape, multiref over field/frame reference indexing."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     mbaff=True)
    enc.picture_mbaff(_mbaff_grid(enc, _mbaff_i), _mbaff_flags(enc),
                      slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    for f in range(1, 5):
        nref = min(f, 4)
        enc.picture_mbaff(_mbaff_grid(enc, _mbaff_p(f, nref)),
                          _mbaff_flags(enc, f), slice_type="P",
                          frame_num=f, poc_lsb=2 * f, nref=nref)
    return enc


def scenario_mbaff_b(mb_w: int = 6, mb_h: int = 6, *,
                     separate: bool = True) -> SepEncoder:
    """I, P anchors, then non-ref MBAFF B frames: B_Direct_16x16 and
    direct 8x8 subs (spatial + colZero through the pair-aware DPB),
    L0/L1/Bi 16x16, pair shapes, skips — across field and frame
    pairs."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     mbaff=True)
    enc.picture_mbaff(_mbaff_grid(
        enc, lambda a, p, m: {"k": "i4"} if (a % 3) else
        {"k": "i16", "pred": 2}), _mbaff_flags(enc),
        slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    enc.picture_mbaff(_mbaff_grid(
        enc, lambda a, p, m: {"k": "skip"} if p % 3 == 1 else
        {"k": "p16", "mvd": (4 - a % 3, a % 5 - 2), "ref": 0}),
        _mbaff_flags(enc, 1), slice_type="P", frame_num=1, poc_lsb=6)

    def bmix(addr, pair, member):
        r = (addr + pair) % 7
        if r == 0:
            return {"k": "skip"}
        if r == 1:
            return {"k": "bdirect"}
        if r == 2:
            return {"k": "b16", "kind": ("l0", "l1", "bi")[addr % 3],
                    "mvd": [(1, -1)] * (2 if addr % 3 == 2 else 1),
                    "ref": [0] * (2 if addr % 3 == 2 else 1)}
        if r == 3:
            return {"k": "b16x8", "kinds": ("l0", "l1"),
                    "mvd": [[(2, 0)], [(0, 2)]], "ref": [[0], [0]]}
        if r == 4:
            return {"k": "b8x16", "kinds": ("l1", "l0"),
                    "mvd": [[(-2, 1)], [(1, -2)]], "ref": [[0], [0]]}
        if r == 5:
            return {"k": "b8x8", "sub": ["direct", "l0", "l1", "bi"],
                    "mvd": [None, [(1, 1)], [(-1, 1)], [(1, 0), (0, 1)]],
                    "ref": [None, [0], [0], [0, 0]]}
        return {"k": "i4"}

    for k, poc in ((2, 2), (3, 4)):
        enc.picture_mbaff(_mbaff_grid(enc, bmix), _mbaff_flags(enc, k),
                          slice_type="B", frame_num=2, poc_lsb=poc,
                          ref=False, nref=1, nref1=1,
                          direct_spatial=True)
    return enc


def scenario_mbaff_diverge(mb_w: int = 6, mb_h: int = 6, *,
                           separate: bool = True) -> SepEncoder:
    """Planes carry DIFFERENT payloads AND different pair coding modes
    (field flags) — each plane of a separate stream is an independent
    monochrome picture, so even the pair field/frame decisions may
    diverge. Parse-sync coverage of per-plane MBAFF state isolation."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     mbaff=True)
    enc.picture_mbaff(_mbaff_grid(enc, _mbaff_i), _mbaff_flags(enc),
                      slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    npair = enc.frame_mbs // 2
    planes = [
        _mbaff_grid(enc, lambda a, p, m: {"k": "skip"} if a % 2 else
                    {"k": "p16", "mvd": (1, 1), "ref": 0}),
        _mbaff_grid(enc, lambda a, p, m:
                    {"k": "p8x8",
                     "mvd": [(1, 0), (0, 1), (-1, 0), (0, -1)],
                     "ref": [0, 0, 0, 0]} if p % 3 == 0 else
                    {"k": "skip"}),
        _mbaff_grid(enc, lambda a, p, m: {"k": "i4"} if a % 4 == 0 else
                    {"k": "p16x8", "mvd": [(0, 2), (2, 0)],
                     "ref": [0, 0]}),
    ]
    flags = [
        [p % 2 == 0 for p in range(npair)],
        [True] * npair,
        [False] * npair,
    ]
    enc.picture_mbaff(planes[0], flags[0], slice_type="P", frame_num=1,
                      poc_lsb=2, plane_mbs=planes, plane_flags=flags)
    return enc


def scenario_mbaff_adaptive(mb_w: int = 6, mb_h: int = 6, *,
                            separate: bool = True) -> SepEncoder:
    """MBAFF frames and PAFF field pairs mixed in one separate-plane
    stream (field pictures of an MBAFF-capable SPS are plain PAFF,
    7.4.4): IDR I MBAFF frame -> P field pair over the frame reference
    -> P MBAFF frame over mixed frame/field references."""
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     mbaff=True)
    enc.picture_mbaff(_mbaff_grid(enc, _mbaff_i), _mbaff_flags(enc),
                      slice_type="I", frame_num=0, poc_lsb=0, idr=True)
    enc.field(_fgrid(enc, lambda i: {"k": "skip"} if i % 2 else
                     {"k": "p16", "mvd": (2, -1), "ref": 0}),
              slice_type="P", bottom=False, frame_num=1, poc_lsb=2)
    enc.field(_fgrid(enc, lambda i: {"k": "p16",
                                     "mvd": (i % 3 - 1, 1), "ref": 0}),
              slice_type="P", bottom=True, frame_num=1, poc_lsb=3)
    enc.picture_mbaff(_mbaff_grid(enc, _mbaff_p(2, 2)),
                      _mbaff_flags(enc, 2), slice_type="P", frame_num=2,
                      poc_lsb=4, nref=2)
    return enc


# --------------------------------------------------------------------------
# MBAFF B-direct per-cell adjudication: MV-REVEALING NEIGHBORS.
#
# libavcodec's export_mvs collapses every direct macroblock to one
# record, so B-direct MVs in MBAFF frames were never adjudicable per
# cell against it (the round-3 "13 of 540 pair-sum observations"
# bound). This scenario closes the gap INDIRECTLY, through libavcodec's
# own MV prediction chain: every direct MB pair is surrounded by
# explicitly-coded B macroblocks ("revealers") whose MV predictor, by
# the unique-refIdx-match rule (8.4.1.3.1), is exactly one 4x4 cell of
# the direct MB — all other candidate neighbors are intra (refIdx -1).
# The revealer's final MV = predictor + our chosen MVD, and libavcodec
# exports explicit MBs per cell exactly, so revealer-MV equality
# between the two decoders pins libavcodec's INTERNAL direct-cell MVs
# against ours: any disagreement in the spatial-direct derivation, the
# 8.4.1.2.2 colocated member/row mapping, the cross field/frame
# vertical MV scaling, or a per-quadrant colZero decision propagates
# into a probed revealer cell.
#
# Probe geometry (quadrants of a direct MB, direct_8x8_inference=1):
#   - right revealer pair, b8x8 subs: sub0's A neighbor = direct cell
#     (3,0) in Q1; sub2's A = cell (3,2) in Q3
#   - below revealer pair, b16x8: upper partition's B-preference rule
#     (8.4.1.3) reads direct-bottom cell (0,3) in Q2
#   - SELF-probe MB [direct,l0,direct,l0] 8x8 subs: explicit sub1's A
#     = direct sub0's cell (1,0) in Q0, sub3's A = direct sub2's cell
#     (1,2) in Q2 — the interior quadrants no external neighbor reads
# Pair field/frame flags vary per B frame (direct field x revealer
# frame, etc.) so every cross-structure neighbor read and colocated
# mapping is crossed; the colocated P anchors hold per-quadrant MVs at
# the colZero threshold (|mv| <= 1) in BOTH field and frame units so
# the +-1 boundary lands on opposite sides of the x2 / >>1 vertical
# scaling (the exact territory of the old pair-sum disagreements).
# --------------------------------------------------------------------------


def _reveal_pairmap(enc: SepEncoder, cells: dict, flags: dict):
    """Sparse pair-coordinate payload: cells[(pc, pr, member)] -> mb
    dict (default i4), flags[(pc, pr)] -> field flag (default frame)."""
    mbs = []
    for a in range(enc.frame_mbs):
        p, m = a >> 1, a & 1
        mbs.append(cells.get((p % enc.mb_w, p // enc.mb_w, m),
                             {"k": "i4"}))
    fl = [flags.get((p % enc.mb_w, p // enc.mb_w), False)
          for p in range(enc.frame_mbs // 2)]
    return mbs, fl


def scenario_mbaff_reveal(mb_w: int = 6, mb_h: int = 6, *,
                          separate: bool = False) -> SepEncoder:
    """MBAFF B frames whose direct MBs are pinned per cell through
    MV-revealing neighbors (see block comment above). Probe metadata on
    the returned encoder: `cell_probes` [(au, raster_mb)] — frame-coded
    explicit revealer MBs compared per 4x4 cell per list vs libavcodec;
    `pair_probes` [(au, pair_row, pair_col)] — field-coded revealer
    pairs compared as pair |mv| sums (field partitions interleave, so
    cell attribution is shape-dependent there)."""
    assert mb_w == 6 and mb_h == 6, "reveal layout is positional"
    enc = SepEncoder(mb_w, mb_h, max_ref=4, separate=separate,
                     mbaff=True)
    enc.cell_probes = []
    enc.pair_probes = []

    def raster(pc, pr, m):
        return (2 * pr + m) * mb_w + pc

    # AU0: all-intra IDR MBAFF frame (every pair frame-coded).
    mbs, fl = _reveal_pairmap(enc, {}, {})
    enc.picture_mbaff(mbs, fl, slice_type="I", frame_num=0, poc_lsb=0,
                      idr=True)

    # Colocated P anchors. All-intra except the pairs colocated with
    # the B frames' direct pairs (pc 1 and 4, pair row 1): per-quadrant
    # MVs straddling the colZero threshold (|mv| <= 1, 8.4.1.2.2) in
    # the pair's own coding units. Left/above neighbors are intra, so
    # sub0's predictor is the zero median and the quadrant MVs are
    # deterministic mvd sums.
    p1_cells = {
        # frame pair: top quadrants (0,0)/(4,0)/(1,1)/(~4,2) — Q0/Q2 at
        # or inside the threshold, Q1/Q3 outside.
        (1, 1, 0): {"k": "p8x8", "mvd": [(0, 0), (4, 0), (1, 1), (0, 2)],
                    "ref": [0, 0, 0, 0]},
        (1, 1, 1): {"k": "p8x8", "mvd": [(0, 1), (-2, 0), (0, -1), (1, 0)],
                    "ref": [0, 0, 0, 0]},
        # FIELD pair: mv_y = 1 FIELD unit — colZero-true read same-
        # structure, doubled past the threshold when a frame direct MB
        # maps onto it.
        (4, 1, 0): {"k": "p16", "mvd": (0, 1), "ref": 0},
        (4, 1, 1): {"k": "p16", "mvd": (3, -2), "ref": 0},
    }
    mbs, fl = _reveal_pairmap(enc, p1_cells, {(4, 1): True})
    enc.picture_mbaff(mbs, fl, slice_type="P", frame_num=1, poc_lsb=12)

    def b_frame(variant: str, swap: bool, poc: int, frame_num: int,
                reorder_l1: list[tuple] | None = None):
        au = len(enc.aus)
        cells = {}
        flags = {}
        l_top, l_bot = ("l1", "l0") if swap else ("l0", "l1")
        smv = [(2, -6), (6, 4)] if swap else [(6, 2), (-4, 6)]
        for pc_setup, pc_dir, pc_rev in ((0, 1, 2), (3, 4, 5)):
            # Setup pair: the direct pair's A neighbor — explicit Bi
            # with ref 0 in both lists, so spatial direct derives
            # refIdxL0 = refIdxL1 = 0 and a nonzero MV (unique match:
            # the pairs above are intra).
            for m in (0, 1):
                cells[(pc_setup, 1, m)] = {
                    "k": "b16", "kind": "bi",
                    "mvd": [smv[0], smv[1]], "ref": [0, 0]}
            # Direct pair. The swap group's top member SELF-probes its
            # interior quadrants: explicit 8x8 subs whose A neighbors
            # are the direct subs' Q0/Q2 cells.
            if swap:
                cells[(pc_dir, 1, 0)] = {
                    "k": "b8x8", "sub": ["direct", l_top, "direct", l_top],
                    "mvd": [None, [(5, -3)], None, [(2, 4)]],
                    "ref": [None, [0], None, [0]]}
                if variant not in ("dfield", "allfield"):
                    enc.cell_probes.append((au, raster(pc_dir, 1, 0)))
            else:
                cells[(pc_dir, 1, 0)] = {"k": "bdirect"}
            cells[(pc_dir, 1, 1)] = {"k": "bdirect"}
            # Right revealer pair: b8x8 L0-only / L1-only subs (per-cell
            # comparable), or 16x16 members when the pair itself is
            # field-coded (pair-sum comparable).
            if variant in ("rfield", "allfield"):
                flags[(pc_rev, 1)] = True
                cells[(pc_rev, 1, 0)] = {"k": "b16", "kind": l_top,
                                         "mvd": [(5, 3)], "ref": [0]}
                cells[(pc_rev, 1, 1)] = {"k": "b16", "kind": l_bot,
                                         "mvd": [(-7, 5)], "ref": [0]}
                enc.pair_probes.append((au, 1, pc_rev))
            else:
                cells[(pc_rev, 1, 0)] = {
                    "k": "b8x8", "sub": [l_top] * 4,
                    "mvd": [[(5, 3)], [(-7, 2)], [(6, -4)], [(3, 5)]],
                    "ref": [[0]] * 4}
                cells[(pc_rev, 1, 1)] = {
                    "k": "b8x8", "sub": [l_bot] * 4,
                    "mvd": [[(4, -6)], [(2, 7)], [(-5, 3)], [(6, 6)]],
                    "ref": [[0]] * 4}
                enc.cell_probes.append((au, raster(pc_rev, 1, 0)))
                enc.cell_probes.append((au, raster(pc_rev, 1, 1)))
            # Below revealer pair (frame-coded): the upper 16x8
            # partition's B-preference rule reads the direct-bottom
            # MB's bottom row.
            cells[(pc_dir, 2, 0)] = {
                "k": "b16x8", "kinds": (l_top, l_top),
                "mvd": [[(4, 5)], [(-3, 7)]], "ref": [[0], [0]]}
            enc.cell_probes.append((au, raster(pc_dir, 2, 0)))
            if variant in ("dfield", "allfield"):
                flags[(pc_dir, 1)] = True
            if variant == "allfield":
                flags[(pc_setup, 1)] = True
        mbs, fl = _reveal_pairmap(enc, cells, flags)
        enc.picture_mbaff(mbs, fl, slice_type="B", frame_num=frame_num,
                          poc_lsb=poc, ref=False, direct_spatial=True,
                          reorder_l1=reorder_l1)

    for i, variant in enumerate(("frame", "dfield", "rfield", "allfield")):
        b_frame(variant, swap=False, poc=2 + 2 * i, frame_num=2)

    # Second anchor: the mirrored colocated design — threshold values
    # in the OPPOSITE coding structure (field pair at pc 1, frame pair
    # at pc 4) and negative mv_y at the >>1 rounding boundary.
    p2_cells = {
        (1, 1, 0): {"k": "p16", "mvd": (-1, -1), "ref": 0},
        (1, 1, 1): {"k": "p16", "mvd": (1, 2), "ref": 0},
        (4, 1, 0): {"k": "p8x8", "mvd": [(-1, 0), (0, -2), (2, 1), (-1, -1)],
                    "ref": [0, 0, 0, 0]},
        (4, 1, 1): {"k": "p8x8", "mvd": [(0, -1), (1, 1), (-3, 0), (0, 3)],
                    "ref": [0, 0, 0, 0]},
    }
    mbs, fl = _reveal_pairmap(enc, p2_cells, {(1, 1): True})
    enc.picture_mbaff(mbs, fl, slice_type="P", frame_num=2, poc_lsb=24)

    for i, variant in enumerate(("frame", "dfield", "rfield", "allfield")):
        b_frame(variant, swap=True, poc=14 + 2 * i, frame_num=3)

    # Third anchor: LONG-TERM colocated (ADVICE r4 — 8.4.1.2.2's
    # short-term condition). The anchor repeats the threshold design
    # (frame pair at pc 1, field pair at pc 4) but is marked LONG-TERM
    # on arrival (MMCO 4 MaxLongTermFrameIdx=0, MMCO 6 idx 0); the B
    # frames then reorder list 1 (op 2, long_term_pic_num 0) so
    # RefPicList1[0] IS the long-term picture. colZeroFlag must then be
    # 0 in EVERY cell — a decoder that skips the short-term gate flips
    # the at-threshold cells to zeroed direct MVs and diverges from
    # libavcodec at every probe below.
    p3_cells = {
        (1, 1, 0): {"k": "p8x8", "mvd": [(0, 0), (4, 0), (1, 1), (0, 2)],
                    "ref": [0, 0, 0, 0]},
        (1, 1, 1): {"k": "p8x8", "mvd": [(0, 1), (-2, 0), (0, -1), (1, 0)],
                    "ref": [0, 0, 0, 0]},
        (4, 1, 0): {"k": "p16", "mvd": (0, 1), "ref": 0},
        (4, 1, 1): {"k": "p16", "mvd": (3, -2), "ref": 0},
    }
    mbs, fl = _reveal_pairmap(enc, p3_cells, {(4, 1): True})
    enc.picture_mbaff(mbs, fl, slice_type="P", frame_num=3, poc_lsb=36,
                      mmco=[(4, 1), (6, 0)])

    for i, variant in enumerate(("frame", "dfield", "rfield", "allfield")):
        b_frame(variant, swap=False, poc=26 + 2 * i, frame_num=4,
                reorder_l1=[(2, 0)])
    return enc


SCENARIOS = {
    "ip": scenario_ip,
    "multislice": scenario_multislice,
    "b_spatial": scenario_b_spatial,
    "b_temporal": scenario_b_temporal,
    "diverge": scenario_diverge,
    "cabac_ip": scenario_cabac_ip,
    "cabac_b": scenario_cabac_b,
    "cabac_resid": scenario_cabac_resid,
    "field_ip": scenario_field_ip,
    "field_b_spatial": scenario_field_b_spatial,
    "field_b_temporal": scenario_field_b_temporal,
    "field_adaptive": scenario_field_adaptive,
    "field_cabac": scenario_field_cabac,
    "mbaff_ip": scenario_mbaff_ip,
    "mbaff_b": scenario_mbaff_b,
    "mbaff_diverge": scenario_mbaff_diverge,
    "mbaff_adaptive": scenario_mbaff_adaptive,
    "mbaff_reveal": scenario_mbaff_reveal,
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
    print(f"{argv[2]}: {len(enc.aus)} frame AUs (3 plane slices each), "
          f"{enc.mb_w}x{enc.mb_h} MBs")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
