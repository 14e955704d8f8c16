"""AV1 OBU + uncompressed header writers (spec sections 5.5 / 5.9).

Reference analog: src/header.rs (bit-exact header emission).  Built from the
AV1 bitstream specification, written for the feature set the encoder
currently signals; every field is written explicitly in spec order so the
syntax is auditable against the spec.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rav1e_tpu.obu.bitio import BitWriter, leb128

# OBU types (spec 6.2.2)
OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_REDUNDANT_FRAME_HEADER = 7
OBU_PADDING = 15

KEY_FRAME = 0
INTER_FRAME = 1
INTRA_ONLY_FRAME = 2
SWITCH_FRAME = 3

PRIMARY_REF_NONE = 7
SUPERRES_DENOM_BITS = 3
SUPERRES_NUM = 8

TX_MODE_ONLY_4X4 = 0
TX_MODE_LARGEST = 1
TX_MODE_SELECT = 2


@dataclass
class Sequence:
    """Sequence-level config (subset of spec sequence_header_obu)."""

    width: int
    height: int
    bit_depth: int = 8
    profile: int = 0  # 0: 4:2:0 8/10-bit; 2 needed for 12-bit
    still_picture: bool = False
    level_idx: int = 19  # maximum parameters; TODO compute from w*h*fps
    use_128x128_superblock: bool = False
    enable_filter_intra: bool = False
    enable_intra_edge_filter: bool = False
    enable_order_hint: bool = True
    order_hint_bits: int = 7
    enable_cdef: bool = False
    enable_restoration: bool = False
    enable_superres: bool = False
    subsampling_x: int = 1
    subsampling_y: int = 1
    chroma_sample_position: int = 0
    color_range: int = 0
    film_grain_params_present: bool = False

    @property
    def sb_size(self) -> int:
        return 128 if self.use_128x128_superblock else 64

    @property
    def frame_id_numbers_present(self) -> bool:
        return False

    @property
    def num_planes(self) -> int:
        return 3


@dataclass
class FrameParams:
    """Per-frame header fields (subset of spec uncompressed_header)."""

    frame_type: int = KEY_FRAME
    show_frame: bool = True
    showable_frame: bool = False
    error_resilient: bool = False
    disable_cdf_update: bool = True
    order_hint: int = 0
    base_q_idx: int = 100
    # DC/AC delta-qs per plane (y_dc, u_dc, u_ac, v_dc, v_ac)
    dc_delta_q: tuple = (0, 0, 0)
    ac_delta_q: tuple = (0, 0, 0)
    loop_filter_levels: tuple = (0, 0, 0, 0)
    loop_filter_sharpness: int = 0
    tx_mode: int = TX_MODE_LARGEST
    reduced_tx_set: bool = True
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    # inter-frame fields (used once inter lands)
    refresh_frame_flags: int = 0xFF
    primary_ref_frame: int = PRIMARY_REF_NONE
    ref_frame_idx: tuple = (0, 1, 2, 3, 4, 5, 6)
    allow_high_precision_mv: bool = False
    interp_filter: int = 0  # EIGHTTAP_REGULAR
    is_motion_mode_switchable: bool = False
    frame_refs_short_signaling: bool = False
    allow_intrabc: bool = False
    force_integer_mv: bool = False
    cdef_damping: int = 3
    cdef_bits: int = 0
    cdef_y_strengths: tuple = (0,)
    cdef_uv_strengths: tuple = (0,)
    lr_unit_shift: int = 0  # restoration units: 64 << shift
    lr_uv_shift: int = 0
    frame_restoration_type: tuple = (0, 0, 0)  # RESTORE_NONE per plane
    skip_mode_present: bool = False
    reference_select: bool = False
    frame_to_show_map_idx: int = 0  # show_existing_frame path
    # per-slot order hints (coded only in error-resilient inter frames)
    ref_order_hints: tuple = (0,) * 8
    # segmentation (SEG_LVL_ALT_Q deltas per segment; empty = disabled)
    seg_deltas: tuple = ()

    @property
    def frame_is_intra(self) -> bool:
        return self.frame_type in (KEY_FRAME, INTRA_ONLY_FRAME)

    @property
    def coded_lossless(self) -> bool:
        return (
            self.base_q_idx == 0
            and all(d == 0 for d in self.dc_delta_q)
            and all(d == 0 for d in self.ac_delta_q)
        )


def obu(obu_type: int, payload: bytes) -> bytes:
    """Wrap payload with an OBU header + leb128 size field."""
    header = bytes([(obu_type << 3) | 0x02])  # has_size_field=1
    return header + leb128(len(payload)) + payload


def temporal_delimiter() -> bytes:
    return obu(OBU_TEMPORAL_DELIMITER, b"")


def write_sequence_header_obu(seq: Sequence) -> bytes:
    w = BitWriter()
    w.f(seq.profile, 3)
    w.f(int(seq.still_picture), 1)
    w.f(0, 1)  # reduced_still_picture_header
    w.f(0, 1)  # timing_info_present_flag
    w.f(0, 1)  # initial_display_delay_present_flag
    w.f(0, 5)  # operating_points_cnt_minus_1
    w.f(0, 12)  # operating_point_idc[0]
    w.f(seq.level_idx, 5)
    if seq.level_idx > 7:
        w.f(0, 1)  # seq_tier[0]
    width_bits = max(1, (seq.width - 1).bit_length())
    height_bits = max(1, (seq.height - 1).bit_length())
    w.f(width_bits - 1, 4)
    w.f(height_bits - 1, 4)
    w.f(seq.width - 1, width_bits)
    w.f(seq.height - 1, height_bits)
    w.f(0, 1)  # frame_id_numbers_present_flag
    w.f(int(seq.use_128x128_superblock), 1)
    w.f(int(seq.enable_filter_intra), 1)
    w.f(int(seq.enable_intra_edge_filter), 1)
    # not reduced_still_picture_header:
    w.f(0, 1)  # enable_interintra_compound
    w.f(0, 1)  # enable_masked_compound
    w.f(0, 1)  # enable_warped_motion
    w.f(0, 1)  # enable_dual_filter
    w.f(int(seq.enable_order_hint), 1)
    if seq.enable_order_hint:
        w.f(0, 1)  # enable_jnt_comp
        w.f(0, 1)  # enable_ref_frame_mvs
    w.f(1, 1)  # seq_choose_screen_content_tools
    # -> seq_force_screen_content_tools = SELECT_SCREEN_CONTENT_TOOLS (2);
    # per-frame allow_screen_content_tools bit is then written (we write 0).
    # force_integer_mv: only read if force_screen_content_tools > 0
    w.f(1, 1)  # seq_choose_integer_mv -> SELECT_INTEGER_MV
    if seq.enable_order_hint:
        w.f(seq.order_hint_bits - 1, 3)
    w.f(int(seq.enable_superres), 1)
    w.f(int(seq.enable_cdef), 1)
    w.f(int(seq.enable_restoration), 1)
    # color_config
    high_bitdepth = seq.bit_depth > 8
    w.f(int(high_bitdepth), 1)
    if seq.profile == 2 and high_bitdepth:
        w.f(int(seq.bit_depth == 12), 1)
    w.f(0, 1)  # mono_chrome (not supported, mirroring reference assert)
    w.f(0, 1)  # color_description_present_flag
    w.f(seq.color_range, 1)
    # subsampling signaling (spec 5.5.2 color_config): profile 0 implies
    # 4:2:0 (position bits only), profile 1 implies 4:4:4 (nothing coded),
    # profile 2 at 8/10-bit implies 4:2:2; profile 2 at 12-bit codes the
    # subsampling explicitly
    if seq.profile == 0:
        w.f(seq.chroma_sample_position, 2)
    elif seq.profile == 1:
        pass  # subsampling_x = subsampling_y = 0, nothing coded
    elif seq.profile == 2 and seq.bit_depth == 12:
        w.f(seq.subsampling_x, 1)
        if seq.subsampling_x:
            w.f(seq.subsampling_y, 1)
        if seq.subsampling_x and seq.subsampling_y:
            w.f(seq.chroma_sample_position, 2)
    elif seq.profile == 2:
        pass  # subsampling_x = 1, subsampling_y = 0 (4:2:2), nothing coded
    w.f(0, 1)  # separate_uv_delta_q
    w.f(int(seq.film_grain_params_present), 1)
    w.trailing_bits()
    return obu(OBU_SEQUENCE_HEADER, w.bytes())


def _write_delta_q(w: BitWriter, value: int) -> None:
    if value:
        w.f(1, 1)
        w.su(value, 6)
    else:
        w.f(0, 1)


def _write_tile_info(w: BitWriter, seq: Sequence, fp: FrameParams) -> None:
    """spec 5.9.15 tile_info, uniform spacing only."""
    sb_shift = 7 if seq.use_128x128_superblock else 6
    sb_cols = (seq.width + seq.sb_size - 1) >> sb_shift
    sb_rows = (seq.height + seq.sb_size - 1) >> sb_shift
    sb_size_log2 = sb_shift
    max_tile_width_sb = 4096 >> sb_size_log2
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_size_log2)
    min_log2_tile_cols = _tile_log2(max_tile_width_sb, sb_cols)
    max_log2_tile_cols = _tile_log2(1, min(sb_cols, 64))
    max_log2_tile_rows = _tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(
        min_log2_tile_cols, _tile_log2(max_tile_area_sb, sb_rows * sb_cols)
    )
    w.f(1, 1)  # uniform_tile_spacing_flag
    tcl = fp.tile_cols_log2
    assert min_log2_tile_cols <= tcl <= max_log2_tile_cols
    for _ in range(tcl - min_log2_tile_cols):
        w.f(1, 1)  # increment_tile_cols_log2
    if tcl < max_log2_tile_cols:
        w.f(0, 1)
    min_log2_tile_rows = max(min_log2_tiles - tcl, 0)
    trl = fp.tile_rows_log2
    assert min_log2_tile_rows <= trl <= max_log2_tile_rows
    for _ in range(trl - min_log2_tile_rows):
        w.f(1, 1)
    if trl < max_log2_tile_rows:
        w.f(0, 1)
    if tcl > 0 or trl > 0:
        w.f(0, tcl + trl)  # context_update_tile_id
        w.f(3, 2)  # tile_size_bytes_minus_1 = 3 (4-byte tile sizes)


def _tile_log2(blk_size: int, target: int) -> int:
    k = 0
    while (blk_size << k) < target:
        k += 1
    return k


def get_relative_dist(seq: Sequence, a: int, b: int) -> int:
    """spec 5.9.3: signed order-hint distance with wraparound."""
    if not seq.enable_order_hint:
        return 0
    diff = a - b
    m = 1 << (seq.order_hint_bits - 1)
    return (diff & (m - 1)) - (diff & m)


def _skip_mode_allowed(seq: Sequence, fp: FrameParams) -> bool:
    """spec 5.9.22 skip_mode_params: whether a skip_mode_present bit is
    coded.  Requires compound-capable references: a (forward, backward)
    pair, or two distinct forward references."""
    if (fp.frame_is_intra or not fp.reference_select
            or not seq.enable_order_hint or fp.error_resilient):
        return False
    fwd_idx = bwd_idx = -1
    fwd_hint = bwd_hint = 0
    for i in range(7):
        ref_hint = fp.ref_order_hints[fp.ref_frame_idx[i]]
        d = get_relative_dist(seq, ref_hint, fp.order_hint)
        if d < 0:
            if fwd_idx < 0 or get_relative_dist(seq, ref_hint, fwd_hint) > 0:
                fwd_idx, fwd_hint = i, ref_hint
        elif d > 0:
            if bwd_idx < 0 or get_relative_dist(seq, ref_hint, bwd_hint) < 0:
                bwd_idx, bwd_hint = i, ref_hint
    if fwd_idx < 0:
        return False
    if bwd_idx >= 0:
        return True
    snd_idx = -1
    snd_hint = 0
    for i in range(7):
        ref_hint = fp.ref_order_hints[fp.ref_frame_idx[i]]
        if get_relative_dist(seq, ref_hint, fwd_hint) < 0:
            if snd_idx < 0 or get_relative_dist(seq, ref_hint, snd_hint) > 0:
                snd_idx, snd_hint = i, ref_hint
    return snd_idx >= 0


def write_frame_header(
    seq: Sequence, fp: FrameParams, *, standalone: bool = False
) -> BitWriter:
    """uncompressed_header (spec 5.9.2) for the feature set we signal."""
    w = BitWriter()
    w.f(0, 1)  # show_existing_frame
    w.f(fp.frame_type, 2)
    w.f(int(fp.show_frame), 1)
    if not fp.show_frame:
        w.f(int(fp.showable_frame), 1)
    if not (fp.frame_type == SWITCH_FRAME or (fp.frame_type == KEY_FRAME and fp.show_frame)):
        w.f(int(fp.error_resilient), 1)
    w.f(int(fp.disable_cdf_update), 1)
    w.f(0, 1)  # allow_screen_content_tools (seq_force == SELECT)
    # frame_size_override_flag
    if fp.frame_type != SWITCH_FRAME:
        w.f(0, 1)
    if seq.enable_order_hint:
        w.f(fp.order_hint & ((1 << seq.order_hint_bits) - 1), seq.order_hint_bits)
    if not (fp.frame_is_intra or fp.error_resilient):
        w.f(fp.primary_ref_frame, 3)
    # no decoder model
    if fp.frame_type != KEY_FRAME or not fp.show_frame:
        if fp.frame_type != SWITCH_FRAME:
            w.f(fp.refresh_frame_flags, 8)
    if (not fp.frame_is_intra or fp.refresh_frame_flags != 0xFF) and \
            fp.error_resilient and seq.enable_order_hint:
        for i in range(8):
            w.f(fp.ref_order_hints[i] & ((1 << seq.order_hint_bits) - 1),
                seq.order_hint_bits)
    if fp.frame_is_intra:
        _write_frame_size(w, seq, fp)
        if fp.allow_intrabc:
            raise NotImplementedError("intrabc")
    else:
        # inter path: ref frame idx signaling
        if seq.enable_order_hint:
            w.f(int(fp.frame_refs_short_signaling), 1)
        assert not fp.frame_refs_short_signaling
        for i in range(7):
            w.f(fp.ref_frame_idx[i], 3)
        # frame_size_override_flag == 0 -> frame_size() + render_size()
        # (frame_size_with_refs only applies when the override flag is set)
        _write_frame_size(w, seq, fp)
        if not fp.force_integer_mv:
            w.f(int(fp.allow_high_precision_mv), 1)
        # read_interpolation_filter
        w.f(0, 1)  # is_filter_switchable
        w.f(fp.interp_filter, 2)
        w.f(int(fp.is_motion_mode_switchable), 1)
        # use_ref_frame_mvs: not coded (seq enable_ref_frame_mvs == 0)
    # disable_frame_end_update_cdf: implied 1 when disable_cdf_update
    if not fp.disable_cdf_update:
        w.f(0, 1)  # disable_frame_end_update_cdf = 0 (adapt across frames)
    _write_tile_info(w, seq, fp)
    # quantization_params
    w.f(fp.base_q_idx, 8)
    _write_delta_q(w, fp.dc_delta_q[0])  # DeltaQYDc
    # num_planes > 1, separate_uv_delta_q == 0 -> diff_uv_delta = 0 (not coded
    # when separate_uv_delta_q == 0)
    _write_delta_q(w, fp.dc_delta_q[1])  # DeltaQUDc
    _write_delta_q(w, fp.ac_delta_q[1])  # DeltaQUAc
    w.f(0, 1)  # using_qmatrix
    # segmentation_params (spec 5.9.14); only SEG_LVL_ALT_Q is used
    if not fp.seg_deltas:
        w.f(0, 1)  # segmentation_enabled
    else:
        w.f(1, 1)
        if fp.primary_ref_frame != PRIMARY_REF_NONE:
            w.f(1, 1)  # segmentation_update_map
            w.f(0, 1)  # segmentation_temporal_update
            w.f(1, 1)  # segmentation_update_data
        # update_data: 8 segments x 8 features
        for seg in range(8):
            for feat in range(8):
                en = feat == 0 and seg < len(fp.seg_deltas)
                w.f(int(en), 1)
                if en:
                    # su(1+8): 9-bit two's-complement signed literal
                    w.f(int(fp.seg_deltas[seg]) & 0x1FF, 9)
    # delta_q_params
    if fp.base_q_idx > 0:
        w.f(0, 1)  # delta_q_present
    # delta_lf only if delta_q_present
    # loop_filter_params
    if not fp.coded_lossless and not fp.allow_intrabc:
        lf = fp.loop_filter_levels
        w.f(lf[0], 6)
        w.f(lf[1], 6)
        if lf[0] or lf[1]:
            w.f(lf[2], 6)
            w.f(lf[3], 6)
        w.f(fp.loop_filter_sharpness, 3)
        w.f(0, 1)  # loop_filter_delta_enabled
    # cdef_params
    if seq.enable_cdef and not fp.coded_lossless and not fp.allow_intrabc:
        w.f(fp.cdef_damping - 3, 2)
        w.f(fp.cdef_bits, 2)
        for i in range(1 << fp.cdef_bits):
            w.f(fp.cdef_y_strengths[i], 6)
            w.f(fp.cdef_uv_strengths[i], 6)
    # lr_params (lr_type values here are the *coded* 2-bit values:
    # 0=NONE 1=SWITCHABLE 2=WIENER 3=SGRPROJ per Remap_Lr_Type)
    if seq.enable_restoration and not (fp.coded_lossless or fp.allow_intrabc):
        uses_lr = any(t != 0 for t in fp.frame_restoration_type)
        uses_chroma_lr = any(t != 0 for t in fp.frame_restoration_type[1:])
        for t in fp.frame_restoration_type:
            w.f(t, 2)
        if uses_lr:
            if seq.use_128x128_superblock:
                w.f(fp.lr_unit_shift - 1, 1)
            else:
                w.f(min(fp.lr_unit_shift, 1), 1)
                if fp.lr_unit_shift:
                    w.f(fp.lr_unit_shift - 1, 1)
            if seq.subsampling_x and seq.subsampling_y and uses_chroma_lr:
                w.f(fp.lr_uv_shift, 1)
    # read_tx_mode
    if not fp.coded_lossless:
        w.f(int(fp.tx_mode == TX_MODE_SELECT), 1)
    # frame_reference_mode
    if not fp.frame_is_intra:
        w.f(int(fp.reference_select), 1)
    # skip_mode_params (spec 5.9.22): skipModeAllowed requires
    # reference_select, order hints and a forward/backward (or two distinct
    # forward) reference pair; when allowed, a skip_mode_present bit is
    # coded — we always signal 0 (no per-block skip_mode symbols)
    if _skip_mode_allowed(seq, fp):
        w.f(int(fp.skip_mode_present), 1)
    # allow_warped_motion: read only if !FrameIsIntra && !error_resilient &&
    # seq.enable_warped_motion (we signal enable_warped_motion=0 -> not read)
    w.f(int(fp.reduced_tx_set), 1)
    # global_motion_params: for each ref, is_global (intra: skipped)
    if not fp.frame_is_intra:
        for _ in range(7):
            w.f(0, 1)  # is_global
    # film grain: seq.film_grain_params_present == 0 -> none
    if standalone:
        w.trailing_bits()
    else:
        w.byte_align()
    return w


def _write_frame_size(w: BitWriter, seq: Sequence, fp: FrameParams) -> None:
    # SWITCH frames have frame_size_override_flag inferred 1: the size is
    # coded explicitly with the sequence header's frame size bit widths
    if fp.frame_type == SWITCH_FRAME:
        width_bits = max(1, (seq.width - 1).bit_length())
        height_bits = max(1, (seq.height - 1).bit_length())
        w.f(seq.width - 1, width_bits)
        w.f(seq.height - 1, height_bits)
    if seq.enable_superres:
        w.f(0, 1)  # use_superres
    w.f(0, 1)  # render_and_frame_size_different


def write_frame_obu(seq: Sequence, fp: FrameParams, tile_payload: bytes) -> bytes:
    """OBU_FRAME: uncompressed header + tile group.  For multi-tile frames
    the payload already carries the per-tile le32 size prefixes (all but the
    last tile), as assembled by the tile encoder; with NumTiles == 1 there
    are no start/end flag bits or size fields."""
    w = write_frame_header(seq, fp, standalone=False)
    if num_tiles_for(seq, fp) > 1:
        # tile_start_and_end_present_flag = 0 (required for OBU_FRAME),
        # then byte_alignment before the first tile size field
        w.f(0, 1)
        w.byte_align()
    header_bytes = w.bytes()
    return obu(OBU_FRAME, header_bytes + tile_payload)


def write_show_existing_obu(slot: int) -> bytes:
    """OBU_FRAME_HEADER with show_existing_frame=1 (spec 5.9.2): displays
    the decoded frame in the given reference slot.  No decoder-model or
    frame-id syntax (our sequence header disables both); the shown frame is
    an inter frame, so no implicit refresh follows."""
    w = BitWriter()
    w.f(1, 1)  # show_existing_frame
    w.f(slot, 3)  # frame_to_show_map_idx
    w.trailing_bits()
    return obu(OBU_FRAME_HEADER, w.bytes())


def num_tiles_for(seq: Sequence, fp: FrameParams) -> int:
    """Tile count implied by the uniform spacing (spec 5.9.15 semantics)."""
    sb_shift = 7 if seq.use_128x128_superblock else 6
    sb_cols = (seq.width + seq.sb_size - 1) >> sb_shift
    sb_rows = (seq.height + seq.sb_size - 1) >> sb_shift
    tw = (sb_cols + (1 << fp.tile_cols_log2) - 1) >> fp.tile_cols_log2
    th = (sb_rows + (1 << fp.tile_rows_log2) - 1) >> fp.tile_rows_log2
    ncols = (sb_cols + tw - 1) // tw
    nrows = (sb_rows + th - 1) // th
    return ncols * nrows
