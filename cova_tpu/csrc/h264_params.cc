#include "h264_params.h"

namespace cova {

static void parse_scaling_list(BitReader& br, uint8_t* list, int size,
                               const uint8_t* fallback) {
  // 7.3.2.1.1.1 scaling_list(); we only need to consume the bits — the
  // values never affect entropy decode, only dequant (which we skip).
  int last = 8, next = 8;
  for (int i = 0; i < size; i++) {
    if (next != 0) {
      int delta = br.read_se();
      next = (last + delta + 256) % 256;
    }
    last = (next == 0) ? last : next;
    list[i] = (uint8_t)last;
  }
  (void)fallback;
}

bool parse_sps(const uint8_t* rbsp, size_t size, Sps* sps) {
  BitReader br(rbsp, size);
  sps->profile_idc = br.read_bits(8);
  br.read_bits(8);  // constraint flags + reserved
  sps->level_idc = br.read_bits(8);
  sps->sps_id = br.read_ue();
  if (sps->profile_idc == 100 || sps->profile_idc == 110 ||
      sps->profile_idc == 122 || sps->profile_idc == 244 ||
      sps->profile_idc == 44 || sps->profile_idc == 83 ||
      sps->profile_idc == 86 || sps->profile_idc == 118 ||
      sps->profile_idc == 128) {
    sps->chroma_format_idc = br.read_ue();
    if (sps->chroma_format_idc == 3)
      sps->separate_colour_plane = br.read_bit();
    sps->bit_depth_luma = br.read_ue() + 8;
    sps->bit_depth_chroma = br.read_ue() + 8;
    sps->qpprime_y_zero_transform_bypass = br.read_bit();
    sps->seq_scaling_matrix_present = br.read_bit();
    if (sps->seq_scaling_matrix_present) {
      int n = (sps->chroma_format_idc != 3) ? 8 : 12;
      for (int i = 0; i < n; i++) {
        bool present = br.read_bit();
        if (present) {
          if (i < 6)
            parse_scaling_list(br, sps->scaling_list_4x4[i], 16, nullptr);
          else
            parse_scaling_list(br, sps->scaling_list_8x8[i - 6], 64, nullptr);
        }
      }
    }
  }
  // 7.4.2.1.1 bounds both log2 fields to [4, 16]: out-of-range values
  // only occur in corrupt streams and would overflow the `1 << n`
  // domains downstream (compute_poc, frame_num wraps) — reject. The
  // comparisons stay in the UNSIGNED exp-Golomb domain: a huge code
  // cast to int can wrap negative and sneak past a signed bound.
  uint32_t lmfn = br.read_ue();
  if (lmfn > 12) return false;
  sps->log2_max_frame_num = (int)lmfn + 4;
  sps->pic_order_cnt_type = br.read_ue();
  if (sps->pic_order_cnt_type == 0) {
    uint32_t lmpl = br.read_ue();
    if (lmpl > 12) return false;
    sps->log2_max_poc_lsb = (int)lmpl + 4;
  } else if (sps->pic_order_cnt_type == 1) {
    sps->delta_pic_order_always_zero = br.read_bit();
    sps->offset_for_non_ref_pic = br.read_se();
    sps->offset_for_top_to_bottom_field = br.read_se();
    int n = br.read_ue();
    for (int i = 0; i < n; i++) sps->offset_for_ref_frame.push_back(br.read_se());
  }
  sps->max_num_ref_frames = br.read_ue();
  sps->gaps_in_frame_num_allowed = br.read_bit();
  sps->pic_width_in_mbs = br.read_ue() + 1;
  sps->pic_height_in_map_units = br.read_ue() + 1;
  sps->frame_mbs_only = br.read_bit();
  if (!sps->frame_mbs_only) sps->mb_adaptive_frame_field = br.read_bit();
  sps->direct_8x8_inference = br.read_bit();
  sps->frame_cropping = br.read_bit();
  if (sps->frame_cropping) {
    sps->crop_left = br.read_ue();
    sps->crop_right = br.read_ue();
    sps->crop_top = br.read_ue();
    sps->crop_bottom = br.read_ue();
  }
  return !br.overrun();
}

bool parse_pps(const uint8_t* rbsp, size_t size, const std::map<int, Sps>& spss,
               Pps* pps) {
  BitReader br(rbsp, size);
  pps->pps_id = br.read_ue();
  pps->sps_id = br.read_ue();
  pps->entropy_coding_mode = br.read_bit();
  pps->bottom_field_pic_order_in_frame_present = br.read_bit();
  pps->num_slice_groups = br.read_ue() + 1;
  if (pps->num_slice_groups > 1) {
    // Slice groups (FMO) — not supported; consume enough to fail safely.
    return false;
  }
  pps->num_ref_idx_l0_default = br.read_ue() + 1;
  pps->num_ref_idx_l1_default = br.read_ue() + 1;
  pps->weighted_pred = br.read_bit();
  pps->weighted_bipred_idc = br.read_bits(2);
  pps->pic_init_qp = br.read_se() + 26;
  pps->pic_init_qs = br.read_se() + 26;
  pps->chroma_qp_index_offset = br.read_se();
  pps->deblocking_filter_control_present = br.read_bit();
  pps->constrained_intra_pred = br.read_bit();
  pps->redundant_pic_cnt_present = br.read_bit();
  if (br.more_rbsp_data()) {
    pps->transform_8x8_mode = br.read_bit();
    pps->pic_scaling_matrix_present = br.read_bit();
    if (pps->pic_scaling_matrix_present) {
      auto it = spss.find(pps->sps_id);
      int cfi = (it != spss.end()) ? it->second.chroma_format_idc : 1;
      int n = 6 + ((cfi != 3) ? 2 : 6) * (pps->transform_8x8_mode ? 1 : 0);
      uint8_t tmp16[16], tmp64[64];
      for (int i = 0; i < n; i++) {
        bool present = br.read_bit();
        if (present) {
          if (i < 6)
            parse_scaling_list(br, tmp16, 16, nullptr);
          else
            parse_scaling_list(br, tmp64, 64, nullptr);
        }
      }
    }
    pps->second_chroma_qp_index_offset = br.read_se();
  } else {
    pps->second_chroma_qp_index_offset = pps->chroma_qp_index_offset;
  }
  return !br.overrun();
}

bool parse_slice_header(BitReader& br, int nal_type, int nal_ref_idc,
                        const std::map<int, Sps>& spss,
                        const std::map<int, Pps>& ppss, const Sps** sps_out,
                        const Pps** pps_out, SliceHeader* sh) {
  bool idr = (nal_type == NAL_SLICE_IDR);
  sh->first_mb_in_slice = br.read_ue();
  sh->slice_type = br.read_ue();
  sh->all_slices_same_type = sh->slice_type >= 5;
  sh->type = sh->slice_type % 5;
  sh->pps_id = br.read_ue();
  auto pit = ppss.find(sh->pps_id);
  if (pit == ppss.end()) return false;
  const Pps& pps = pit->second;
  auto sit = spss.find(pps.sps_id);
  if (sit == spss.end()) return false;
  const Sps& sps = sit->second;
  *sps_out = &sps;
  *pps_out = &pps;

  sh->colour_plane_id =
      sps.separate_colour_plane ? (int)br.read_bits(2) : 0;
  if (sh->colour_plane_id > 2) return false;  // 7.4.3: in [0, 2]
  sh->frame_num = br.read_bits(sps.log2_max_frame_num);
  sh->field_pic = false;
  sh->bottom_field = false;
  sh->delta_poc_bottom = 0;
  if (!sps.frame_mbs_only) {
    sh->field_pic = br.read_bit();
    if (sh->field_pic) sh->bottom_field = br.read_bit();
  }
  if (idr) sh->idr_pic_id = br.read_ue();
  if (sps.pic_order_cnt_type == 0) {
    sh->pic_order_cnt_lsb = (int)br.read_bits(sps.log2_max_poc_lsb);
    if (pps.bottom_field_pic_order_in_frame_present && !sh->field_pic)
      sh->delta_poc_bottom = br.read_se();
  } else if (sps.pic_order_cnt_type == 1 && !sps.delta_pic_order_always_zero) {
    sh->delta_pic_order_cnt0 = br.read_se();
    if (pps.bottom_field_pic_order_in_frame_present && !sh->field_pic)
      br.read_se();
  }
  if (pps.redundant_pic_cnt_present) br.read_ue();

  if (sh->type == SLICE_B) sh->direct_spatial_mv_pred = br.read_bit();

  // Field slices default to twice the PPS count (7.4.3: inferred
  // num_ref_idx_lX_active_minus1 = 2 * default_minus1 + 1 when
  // field_pic_flag is 1 and no override follows) — both fields of each
  // referenced frame are addressable.
  int field_mult = sh->field_pic ? 2 : 1;
  sh->num_ref_idx_l0 = field_mult * pps.num_ref_idx_l0_default;
  sh->num_ref_idx_l1 = field_mult * pps.num_ref_idx_l1_default;
  if (sh->type == SLICE_P || sh->type == SLICE_SP || sh->type == SLICE_B) {
    bool override_flag = br.read_bit();
    if (override_flag) {
      sh->num_ref_idx_l0 = br.read_ue() + 1;
      if (sh->type == SLICE_B) sh->num_ref_idx_l1 = br.read_ue() + 1;
    }
  }

  // ref_pic_list_modification (7.3.3.1): short-term ops (idc 0/1,
  // abs_diff_pic_num_minus1) and long-term ops (idc 2,
  // long_term_pic_num) recorded for the MV-export DPB's 8.2.4.3
  // list construction.
  sh->list_mod[0].clear();
  sh->list_mod[1].clear();
  if (sh->type != SLICE_I && sh->type != SLICE_SI) {
    bool mod_l0 = br.read_bit();
    if (mod_l0) {
      int op;
      while ((op = br.read_ue()) != 3) {
        int val = (int)br.read_ue();
        if (op >= 0 && op <= 2) sh->list_mod[0].emplace_back(op, val);
        if (br.overrun()) return false;
      }
    }
  }
  if (sh->type == SLICE_B) {
    bool mod_l1 = br.read_bit();
    if (mod_l1) {
      int op;
      while ((op = br.read_ue()) != 3) {
        int val = (int)br.read_ue();
        if (op >= 0 && op <= 2) sh->list_mod[1].emplace_back(op, val);
        if (br.overrun()) return false;
      }
    }
  }

  // pred_weight_table (7.3.3.2)
  if ((pps.weighted_pred && (sh->type == SLICE_P || sh->type == SLICE_SP)) ||
      (pps.weighted_bipred_idc == 1 && sh->type == SLICE_B)) {
    br.read_ue();  // luma_log2_weight_denom
    if (sps.chroma_format_idc != 0) br.read_ue();  // chroma denom
    for (int list = 0; list < (sh->type == SLICE_B ? 2 : 1); list++) {
      int n = (list == 0) ? sh->num_ref_idx_l0 : sh->num_ref_idx_l1;
      for (int i = 0; i < n; i++) {
        if (br.read_bit()) {  // luma_weight_flag
          br.read_se();
          br.read_se();
        }
        if (sps.chroma_format_idc != 0 && br.read_bit()) {
          for (int j = 0; j < 2; j++) {
            br.read_se();
            br.read_se();
          }
        }
      }
    }
  }

  // dec_ref_pic_marking (7.3.3.3): the full MMCO list is recorded
  // (SliceHeader::mmco). Payload per op (7.4.3.3): 1 -> diff_minus1;
  // 2 -> long_term_pic_num; 3 -> diff_minus1 + long_term_frame_idx;
  // 4 -> max_long_term_frame_idx_plus1; 5 -> none; 6 ->
  // long_term_frame_idx. (An earlier revision skipped op 4's payload
  // entirely — a slice-header desync on any stream using it.)
  sh->mmco.clear();
  sh->longterm_reference = false;
  if (nal_ref_idc != 0) {
    if (idr) {
      br.read_bit();  // no_output_of_prior_pics
      sh->longterm_reference = br.read_bit();
    } else {
      bool adaptive = br.read_bit();
      if (adaptive) {
        int op;
        while ((op = br.read_ue()) != 0) {
          if (op < 1 || op > 6) return false;  // 7.4.3.3: in [0, 6]
          int v1 = 0, v2 = 0;
          if (op == 1 || op == 2 || op == 3 || op == 4 || op == 6)
            v1 = (int)br.read_ue();
          if (op == 3) v2 = (int)br.read_ue();
          sh->mmco.push_back({op, v1, v2});
          if (br.overrun()) return false;
        }
      }
    }
  }

  if (pps.entropy_coding_mode && sh->type != SLICE_I && sh->type != SLICE_SI) {
    // 7.4.3: cabac_init_idc in [0, 2] — it indexes kCabacInitPB.
    // Compare in the UNSIGNED domain: a corrupt exp-Golomb code can
    // exceed INT_MAX and the int-cast value would sneak past a signed
    // `> 2` as negative (found by the PAFF-corpus fuzzer).
    uint32_t idc = br.read_ue();
    if (idc > 2) return false;
    sh->cabac_init_idc = (int)idc;
  }
  sh->slice_qp = pps.pic_init_qp + br.read_se();
  if (sh->type == SLICE_SP || sh->type == SLICE_SI) {
    if (sh->type == SLICE_SP) br.read_bit();  // sp_for_switch_flag
    br.read_se();                             // slice_qs_delta
  }
  if (pps.deblocking_filter_control_present) {
    sh->disable_deblocking_filter_idc = br.read_ue();
    if (sh->disable_deblocking_filter_idc != 1) {
      br.read_se();  // slice_alpha_c0_offset_div2
      br.read_se();  // slice_beta_offset_div2
    }
  }
  // num_slice_groups > 1 rejected in PPS parse.
  return !br.overrun();
}

}  // namespace cova
