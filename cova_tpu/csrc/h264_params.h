// H.264 parameter set parsing (SPS / PPS / slice header) — first-party,
// written from ITU-T Rec. H.264 (05/2003 + amendments) syntax clauses
// 7.3.2.1 / 7.3.2.2 / 7.3.3.
#pragma once

#include <array>
#include <cstdint>
#include <map>
#include <utility>
#include <vector>

#include "bitreader.h"

namespace cova {

enum NalType {
  NAL_SLICE_NON_IDR = 1,
  NAL_SLICE_PART_A = 2,
  NAL_SLICE_IDR = 5,
  NAL_SEI = 6,
  NAL_SPS = 7,
  NAL_PPS = 8,
  NAL_AUD = 9,
};

enum SliceType {
  SLICE_P = 0,
  SLICE_B = 1,
  SLICE_I = 2,
  SLICE_SP = 3,
  SLICE_SI = 4,
};

struct Sps {
  int profile_idc = 0;
  int level_idc = 0;
  int sps_id = 0;
  int chroma_format_idc = 1;
  bool separate_colour_plane = false;
  int bit_depth_luma = 8;
  int bit_depth_chroma = 8;
  bool qpprime_y_zero_transform_bypass = false;
  bool seq_scaling_matrix_present = false;
  uint8_t scaling_list_4x4[6][16];
  uint8_t scaling_list_8x8[6][64];
  int log2_max_frame_num = 4;
  int pic_order_cnt_type = 0;
  int log2_max_poc_lsb = 4;
  bool delta_pic_order_always_zero = false;
  int offset_for_non_ref_pic = 0;
  int offset_for_top_to_bottom_field = 0;
  std::vector<int> offset_for_ref_frame;
  int max_num_ref_frames = 0;
  bool gaps_in_frame_num_allowed = false;
  int pic_width_in_mbs = 0;
  int pic_height_in_map_units = 0;
  bool frame_mbs_only = true;
  bool mb_adaptive_frame_field = false;
  bool direct_8x8_inference = true;
  bool frame_cropping = false;
  int crop_left = 0, crop_right = 0, crop_top = 0, crop_bottom = 0;

  int width_mbs() const { return pic_width_in_mbs; }
  int height_mbs() const {
    return pic_height_in_map_units * (frame_mbs_only ? 1 : 2);
  }
};

struct Pps {
  int pps_id = 0;
  int sps_id = 0;
  bool entropy_coding_mode = false;  // false=CAVLC, true=CABAC
  bool bottom_field_pic_order_in_frame_present = false;
  int num_slice_groups = 1;
  int num_ref_idx_l0_default = 1;
  int num_ref_idx_l1_default = 1;
  bool weighted_pred = false;
  int weighted_bipred_idc = 0;
  int pic_init_qp = 26;
  int pic_init_qs = 26;
  int chroma_qp_index_offset = 0;
  bool deblocking_filter_control_present = false;
  bool constrained_intra_pred = false;
  bool redundant_pic_cnt_present = false;
  // More-rbsp extension (High profile):
  bool transform_8x8_mode = false;
  bool pic_scaling_matrix_present = false;
  int second_chroma_qp_index_offset = 0;
};

struct SliceHeader {
  int first_mb_in_slice = 0;
  int slice_type = 0;       // raw value (may be +5 variant)
  int type = 0;             // modulo-5 SliceType
  bool all_slices_same_type = false;  // slice_type >= 5
  int pps_id = 0;
  // colour_plane_id (7.4.3): which colour plane this slice codes when
  // the SPS has separate_colour_plane_flag (0 = Y, 1 = Cb, 2 = Cr);
  // always 0 otherwise.
  int colour_plane_id = 0;
  int frame_num = 0;
  bool field_pic = false;
  bool bottom_field = false;
  int idr_pic_id = 0;
  int num_ref_idx_l0 = 1;
  int num_ref_idx_l1 = 1;
  bool direct_spatial_mv_pred = false;
  int cabac_init_idc = 0;
  int slice_qp = 26;
  int disable_deblocking_filter_idc = 0;
  // --- fields for POC / DPB emulation (temporal-direct MV export) ---
  int pic_order_cnt_lsb = 0;      // poc type 0
  // delta_pic_order_cnt_bottom (poc type 0, frames): BottomFieldOrderCnt
  // = TopFieldOrderCnt + this. x264 interlaced emits -1; needed for the
  // POC-proximity colocated-field selection in MBAFF B-direct.
  int delta_poc_bottom = 0;
  int delta_pic_order_cnt0 = 0;   // poc type 1
  // ref_pic_list_modification ops per list: pairs of
  // (modification_of_pic_nums_idc, value) with idc 0/1 =
  // abs_diff_pic_num_minus1 (short-term) and idc 2 = long_term_pic_num
  // (8.2.4.3.2). All three are modeled by the MV-export DPB.
  std::vector<std::pair<int, int>> list_mod[2];
  // dec_ref_pic_marking (7.4.3.3): the full MMCO op list, in order, as
  // (op, v1, v2) — op 1 (v1 = difference_of_pic_nums_minus1), op 2
  // (v1 = long_term_pic_num), op 3 (v1 = difference_of_pic_nums_minus1,
  // v2 = long_term_frame_idx), op 4 (v1 = max_long_term_frame_idx_
  // plus1), op 5, op 6 (v1 = long_term_frame_idx). Ops 1-4 and 6 are
  // modeled by the MV-export DPB; op 5 (reset) triggers the
  // approximation fallback until the next IDR.
  std::vector<std::array<int, 3>> mmco;
  bool longterm_reference = false;  // IDR long_term_reference_flag
};

// Parse an SPS RBSP (without the NAL header byte).
bool parse_sps(const uint8_t* rbsp, size_t size, Sps* sps);
// Parse a PPS RBSP (without the NAL header byte).
bool parse_pps(const uint8_t* rbsp, size_t size, const std::map<int, Sps>& spss,
               Pps* pps);
// Parse a slice header; `br` is positioned after it on success (ready for
// CABAC alignment / slice data). `nal_type` distinguishes IDR.
bool parse_slice_header(BitReader& br, int nal_type, int nal_ref_idc,
                        const std::map<int, Sps>& spss,
                        const std::map<int, Pps>& ppss, const Sps** sps_out,
                        const Pps** pps_out, SliceHeader* sh);

}  // namespace cova
