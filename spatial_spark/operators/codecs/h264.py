"""H.264 (ITU-T H.264 / ISO 14496-10) config + intra tier: SPS/avcC,
I_PCM, CAVLC entropy coding, Intra_16x16 luma/chroma prediction and AC
residuals.  Split out of the codecs monolith in r12; behavior
unchanged."""

from __future__ import annotations

import math
import struct

import numpy as np
from .bits import (
    _EgBitReader,
    _EgBitWriter,
    _H264_HIGH_PROFILES,
    _insert_emulation,
    _strip_emulation,
)

def _skip_scaling_list(r: _EgBitReader, size: int):
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = nxt if nxt != 0 else last


def parse_h264_sps(sps: bytes) -> dict:
    """Parse an H.264 sequence parameter set NAL (with or without its
    1-byte NAL header) into ``{"profile_idc", "level_idc",
    "chroma_format_idc", "bit_depth_luma", "width", "height",
    "frame_mbs_only"}``.  Width/height apply the frame-cropping
    rectangle with the chroma-format crop units — the TRUE coded
    dimensions, not the macroblock-padded ones."""
    data = _strip_emulation(bytes(sps))
    if data and (data[0] & 0x1F) == 7:      # NAL header present
        data = data[1:]
    r = _EgBitReader(data)
    profile = r.read(8)
    r.read(8)                               # constraint flags + reserved
    level = r.read(8)
    r.ue()                                  # seq_parameter_set_id
    chroma, bit_depth = 1, 8
    if profile in _H264_HIGH_PROFILES:
        chroma = r.ue()
        if chroma > 3:
            raise ValueError(f"H264: chroma_format_idc {chroma} out of "
                             "0..3")
        separate = r.read(1) if chroma == 3 else 0
        bit_depth = 8 + r.ue()
        r.ue()                              # bit_depth_chroma_minus8
        r.read(1)                           # qpprime_y_zero bypass
        if r.read(1):                       # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if r.read(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    else:
        separate = 0
    r.ue()                                  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.read(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                                  # max_num_ref_frames
    r.read(1)                               # gaps_in_frame_num allowed
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.read(1)
    if not frame_mbs_only:
        r.read(1)                           # mb_adaptive_frame_field
    r.read(1)                               # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.read(1):                           # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma]
    unit_x = 1 if (chroma == 0 or separate) else sub_w
    unit_y = (1 if (chroma == 0 or separate) else sub_h) \
        * (2 - frame_mbs_only)
    width = 16 * w_mbs - unit_x * (crop_l + crop_r)
    height = 16 * (2 - frame_mbs_only) * h_units - unit_y * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("H264: SPS crop rectangle exceeds the frame "
                         f"({width}x{height})")
    return {"profile_idc": profile, "level_idc": level,
            "chroma_format_idc": chroma, "bit_depth_luma": bit_depth,
            "width": width, "height": height,
            "frame_mbs_only": bool(frame_mbs_only)}


def build_h264_sps(width: int, height: int, profile_idc: int = 66,
                   level_idc: int = 30, bit_depth: int = 8) -> bytes:
    """Encode a minimal valid SPS NAL for the given EVEN dimensions
    (4:2:0 crop units are 2 px) — the fixture generator parse_h264_sps
    round-trips against.  High profiles (>=100 family) carry the
    chroma/bit-depth fields; others imply 4:2:0/8-bit."""
    if width % 2 or height % 2:
        raise ValueError("SPS fixture: 4:2:0 dimensions must be even")
    w = _EgBitWriter()
    w.write(0x67, 8)                        # NAL: ref_idc=3, type=7 (SPS)
    w.write(profile_idc, 8)
    w.write(0, 8)
    w.write(level_idc, 8)
    w.ue(0)                                 # sps id
    if profile_idc in _H264_HIGH_PROFILES:
        w.ue(1)                             # chroma_format_idc 4:2:0
        w.ue(bit_depth - 8)
        w.ue(bit_depth - 8)
        w.write(0, 2)                       # bypass + scaling matrix
    elif bit_depth != 8:
        raise ValueError("SPS fixture: bit depth needs a high profile")
    w.ue(0)                                 # log2_max_frame_num_minus4
    w.ue(2)                                 # poc_type 2 (no extra fields)
    w.ue(1)                                 # max_num_ref_frames
    w.write(0, 1)
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.write(1, 1)                           # frame_mbs_only
    w.write(1, 1)                           # direct_8x8_inference
    crop_r = (16 * w_mbs - width) // 2
    crop_b = (16 * h_mbs - height) // 2
    if crop_r or crop_b:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.write(0, 1)
    w.write(0, 1)                           # vui_parameters_present
    body = w.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


def parse_avcc(b: bytes) -> dict:
    """AVCDecoderConfigurationRecord (the avcC box payload): profile /
    level bytes plus the embedded SPS NALs; the first SPS is parsed
    for true dimensions."""
    b = bytes(b)
    if len(b) < 7 or b[0] != 1:
        raise ValueError("avcC: bad configurationVersion")
    n_sps = b[5] & 0x1F
    pos, sps_list = 6, []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", b, pos)[0]
        sps_list.append(b[pos + 2:pos + 2 + ln])
        pos += 2 + ln
    out = {"profile_idc": b[1], "level_idc": b[3],
           "nal_length_size": (b[4] & 3) + 1, "sps": sps_list}
    if sps_list:
        out.update(parse_h264_sps(sps_list[0]))
    return out


def build_avcc(sps: bytes, pps: bytes = b"\x68\xce\x38\x80") -> bytes:
    """Wrap an SPS (+ a minimal PPS) as an avcC payload."""
    sps = bytes(sps)
    return (bytes((1, sps[1], sps[2], sps[3], 0xFF, 0xE1))
            + struct.pack(">H", len(sps)) + sps
            + b"\x01" + struct.pack(">H", len(pps)) + pps)



# ------------------------------------------------- H.264 I_PCM bitstream
# The spec's lossless escape hatch (ITU-T H.264 §7.3.5 / §7.4.5 /
# §8.3.5): an I_PCM macroblock carries raw 8-bit samples — no
# prediction, transform or entropy coding — so a conformant IDR slice
# of I_PCM macroblocks is a REAL avc1 bitstream (any player decodes
# it) that this repo can both write and read exactly.  This narrows
# the video seam from "avc1 payloads need ffmpeg" to "entropy-coded
# (CAVLC/CABAC residual) macroblocks need ffmpeg".
#
# Frame geometry matches build_h264_sps / the default PPS in
# build_avcc: 4:2:0, frame_mbs_only, poc_type 2, CAVLC flags (unused
# by PCM), log2_max_frame_num 4.  Color is JFIF full-range YCbCr —
# the same matrix as encode_jpeg/decode_jpeg, so gray frames
# round-trip bit-exactly.


def encode_h264_ipcm(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB / (h, w) gray uint8 → one IDR slice NAL (type 5)
    of I_PCM macroblocks, emulation-prevention applied.  Pair with
    build_h264_sps(w, h) + build_avcc + build_mp4(codec='avc1',
    samples=[struct.pack('>I', len(nal)) + nal, ...])."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                0, 255).astype(np.uint8)
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # pad to whole macroblocks by edge replication (SPS crop recovers)
    mw, mh = 16 * ((w + 15) // 16), 16 * ((h + 15) // 16)
    pad = ((0, mh - h), (0, mw - w))
    yp = np.pad(y, pad, mode="edge")
    cbp = np.pad(cb, pad, mode="edge")
    crp = np.pad(cr, pad, mode="edge")
    # 4:2:0 chroma: 2x2 mean then round (encode_jpeg's subsample rule)
    def sub(c):
        m = (c[0::2, 0::2] + c[0::2, 1::2]
             + c[1::2, 0::2] + c[1::2, 1::2]) / 4.0
        return np.clip(np.round(m), 0, 255).astype(np.uint8)
    cbs, crs = sub(cbp), sub(crp)

    wtr = _EgBitWriter()
    wtr.write(0x65, 8)                  # NAL: ref_idc=3, type=5 (IDR)
    wtr.ue(0)                           # first_mb_in_slice
    wtr.ue(7)                           # slice_type: I (all-I picture)
    wtr.ue(0)                           # pic_parameter_set_id
    wtr.write(0, 4)                     # frame_num (log2_max = 4)
    wtr.ue(0)                           # idr_pic_id
    wtr.write(0, 2)                     # dec_ref_pic_marking (IDR): 0,0
    wtr.se(0)                           # slice_qp_delta
    for mby in range(mh // 16):
        for mbx in range(mw // 16):
            wtr.ue(25)                  # mb_type I_PCM (I slice)
            while len(wtr.bits) % 8:    # pcm_alignment_zero_bit
                wtr.write(0, 1)
            blk = yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16]
            for byte in blk.reshape(-1):
                wtr.write(int(byte), 8)
            for plane in (cbs, crs):
                cblk = plane[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8]
                for byte in cblk.reshape(-1):
                    wtr.write(int(byte), 8)
    body = wtr.bytes_aligned()          # appends rbsp stop bit + align
    return body[:1] + _insert_emulation(body[1:])


def decode_h264_ipcm(nal: bytes, width: int, height: int) -> np.ndarray:
    """One IDR/non-IDR I-slice NAL of I_PCM macroblocks → (height,
    width, 3) uint8 RGB.  Raises NotImplementedError at the first
    entropy-coded macroblock — the exact remaining ffmpeg seam."""
    data = _strip_emulation(bytes(nal))
    if not data or (data[0] & 0x1F) not in (1, 5):
        raise ValueError("H264: not a slice NAL")
    idr = (data[0] & 0x1F) == 5
    r = _EgBitReader(data[1:])
    if r.ue() != 0:
        raise ValueError("H264: multi-slice pictures unsupported")
    stype = r.ue()
    if stype % 5 != 2:                  # 2/7 = I slice
        raise NotImplementedError(
            "H264: only I slices decode natively (P/B prediction needs "
            "ffmpeg)")
    r.ue()                              # pic_parameter_set_id
    r.read(4)                           # frame_num (log2_max = 4)
    if idr:
        r.ue()                          # idr_pic_id
        r.read(2)                       # dec_ref_pic_marking
    r.se()                              # slice_qp_delta
    mw, mh = 16 * ((width + 15) // 16), 16 * ((height + 15) // 16)
    yp = np.zeros((mh, mw), dtype=np.uint8)
    cbs = np.zeros((mh // 2, mw // 2), dtype=np.uint8)
    crs = np.zeros((mh // 2, mw // 2), dtype=np.uint8)
    for mby in range(mh // 16):
        for mbx in range(mw // 16):
            mb_type = r.ue()
            if mb_type != 25:
                raise NotImplementedError(
                    f"H264: mb_type {mb_type} is entropy-coded — only "
                    "I_PCM macroblocks decode natively (the ffmpeg seam)")
            while r.pos % 8:            # pcm_alignment_zero_bit
                if r.read(1):
                    raise ValueError("H264: nonzero PCM alignment bit")
            at = 1 + (r.pos >> 3)       # byte offset into `data`
            if at + 384 > len(data):
                raise ValueError("H264: truncated I_PCM macroblock")
            mb = np.frombuffer(data, dtype=np.uint8,
                               offset=at, count=384)
            yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
                mb[:256].reshape(16, 16)
            cbs[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                mb[256:320].reshape(8, 8)
            crs[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                mb[320:384].reshape(8, 8)
            r.pos += 384 * 8
    return _h264_planes_to_rgb(yp, cbs, crs, width, height)


def _h264_planes_to_rgb(yp, cbs, crs, width: int, height: int) -> np.ndarray:
    """Padded (mh, mw) luma + (mh/2, mw/2) chroma planes → cropped
    (height, width, 3) uint8 RGB (JFIF matrix, replication chroma
    upsample) — the shared display tail of every H.264 route."""
    y = np.asarray(yp, dtype=np.float64)[:height, :width]
    cb = np.kron(np.asarray(cbs, dtype=np.float64),
                 np.ones((2, 2)))[:height, :width]
    cr = np.kron(np.asarray(crs, dtype=np.float64),
                 np.ones((2, 2)))[:height, :width]
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([rr, gg, bb], axis=2)), 0,
                   255).astype(np.uint8)



# ---------------------------------------------------------------------------
# H.264 CAVLC (entropy-coded) I_16x16 route — narrows the I_PCM-only seam
# ---------------------------------------------------------------------------
# coeff_token VLC, 0 <= nC < 2 column (T-REC-H.264 Table 9-5): the context
# every block in this module's streams parses under (one MB per picture
# region with cbp_luma = 0 keeps all neighbouring AC TotalCoeff at 0, so
# nC = 0 throughout).  Keys: (trailing_ones, total_coeff) -> bitstring.
# Prefix-freeness is asserted at import; conformance beyond that is pinned
# against this module's own encoder (documented scope: no external
# bitstreams with nC >= 2 contexts).
_CAVLC_COEFF_TOKEN_NC02 = {
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101",
    (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}

# coeff_token VLC, nC == -1 column (Table 9-5): the ChromaDCLevel
# context for 4:2:0 (maxNumCoeff = 4).
_CAVLC_COEFF_TOKEN_NCM1 = {
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010",
    (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

# total_zeros VLC for chroma DC 2x2 blocks, 4:2:0 (Table 9-9(a)),
# indexed [total_coeff][total_zeros].
_CAVLC_TOTAL_ZEROS_CDC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# total_zeros VLC for 4x4 blocks (Table 9-7/9-8), indexed
# [total_coeff][total_zeros] -> bitstring (total_coeff 1..15).
_CAVLC_TOTAL_ZEROS = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# run_before VLC (Table 9-10), indexed [min(zeros_left, 7)][run] ->
# bitstring; zeros_left >= 1.
_CAVLC_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001",
        "00001", "000001", "0000001", "00000001", "000000001",
        "0000000001", "00000000001"],
}


def _assert_prefix_free(codes):
    seen = sorted(codes)
    for a, b in zip(seen, seen[1:]):
        if b.startswith(a):
            raise AssertionError(f"CAVLC table not prefix-free: {a} / {b}")


_assert_prefix_free(list(_CAVLC_COEFF_TOKEN_NC02.values()))
_assert_prefix_free(list(_CAVLC_COEFF_TOKEN_NCM1.values()))
for _tc, _codes in _CAVLC_TOTAL_ZEROS.items():
    _assert_prefix_free(_codes)
for _tc, _codes in _CAVLC_TOTAL_ZEROS_CDC.items():
    _assert_prefix_free(_codes)
for _zl, _codes in _CAVLC_RUN_BEFORE.items():
    _assert_prefix_free(_codes)

_CAVLC_COEFF_TOKEN_DEC = {v: k for k, v in _CAVLC_COEFF_TOKEN_NC02.items()}
_CAVLC_COEFF_TOKEN_NCM1_DEC = {
    v: k for k, v in _CAVLC_COEFF_TOKEN_NCM1.items()}


def _bits_write(wtr, bitstring: str):
    for ch in bitstring:
        wtr.write(1 if ch == "1" else 0, 1)


def _vlc_read(r, table: dict):
    code = ""
    for _ in range(32):
        code += "1" if r.read(1) else "0"
        if code in table:
            return table[code]
    raise ValueError("H264 CAVLC: no VLC match within 32 bits")


def cavlc_encode_block(wtr, levels, chroma_dc: bool = False) -> None:
    """CAVLC-encode one coefficient list (scan order) under the nC < 2
    context — or, with ``chroma_dc``, the nC == -1 ChromaDCLevel
    context (maxNumCoeff = 4, Table 9-9(a) total_zeros).  ``levels`` is
    the scanned list INCLUDING zeros (length = maxNumCoeff)."""
    tok_tab = _CAVLC_COEFF_TOKEN_NCM1 if chroma_dc \
        else _CAVLC_COEFF_TOKEN_NC02
    tz_tab = _CAVLC_TOTAL_ZEROS_CDC if chroma_dc else _CAVLC_TOTAL_ZEROS
    n = len(levels)
    nz = [(i, v) for i, v in enumerate(levels) if v != 0]
    total_coeff = len(nz)
    # trailing ones: up to 3 |1| coefficients at the high-frequency end
    t1 = 0
    for i in range(total_coeff - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _bits_write(wtr, tok_tab[(t1, total_coeff)])
    if total_coeff == 0:
        return
    # trailing-one signs, high frequency first
    for i in range(total_coeff - 1, total_coeff - 1 - t1, -1):
        wtr.write(1 if nz[i][1] < 0 else 0, 1)
    # remaining levels, high frequency first
    suffix_len = 1 if total_coeff > 10 and t1 < 3 else 0
    first = True
    for i in range(total_coeff - 1 - t1, -1, -1):
        level = nz[i][1]
        code = 2 * abs(level) - 2 if level > 0 else 2 * abs(level) - 1
        if first and t1 < 3:
            code -= 2
        first = False
        if suffix_len == 0:
            if code < 14:
                _bits_write(wtr, "0" * code + "1")
            elif code < 30:
                _bits_write(wtr, "0" * 14 + "1")
                wtr.write(code - 14, 4)
            else:
                _bits_write(wtr, "0" * 15 + "1")
                wtr.write(code - 30, 12)
        else:
            prefix = code >> suffix_len
            if prefix < 15:
                _bits_write(wtr, "0" * prefix + "1")
                wtr.write(code & ((1 << suffix_len) - 1), suffix_len)
            else:
                _bits_write(wtr, "0" * 15 + "1")
                wtr.write(code - (15 << suffix_len), 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    highest = nz[-1][0]
    total_zeros = highest + 1 - total_coeff
    if total_coeff < n:
        _bits_write(wtr, tz_tab[total_coeff][total_zeros])
    # run_before, high frequency first
    zeros_left = total_zeros
    for i in range(total_coeff - 1, 0, -1):
        if zeros_left == 0:
            break
        run = nz[i][0] - nz[i - 1][0] - 1
        _bits_write(wtr, _CAVLC_RUN_BEFORE[min(zeros_left, 7)][run])
        zeros_left -= run


def cavlc_decode_block(r, max_coeff: int = 16, chroma_dc: bool = False):
    """Decode one CAVLC block (nC < 2 context — or the nC == -1
    ChromaDCLevel context with ``chroma_dc``) -> list of ``max_coeff``
    levels in scan order."""
    t1, total_coeff = _vlc_read(
        r, _CAVLC_COEFF_TOKEN_NCM1_DEC if chroma_dc
        else _CAVLC_COEFF_TOKEN_DEC)
    out = [0] * max_coeff
    if total_coeff == 0:
        return out
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.read(1) else 1)
    suffix_len = 1 if total_coeff > 10 and t1 < 3 else 0
    first = True
    for _ in range(total_coeff - t1):
        prefix = 0
        while r.read(1) == 0:
            prefix += 1
            if prefix > 15:
                raise ValueError("H264 CAVLC: bad level prefix")
        if suffix_len == 0:
            if prefix < 14:
                code = prefix
            elif prefix == 14:
                code = 14 + r.read(4)
            else:
                code = 30 + r.read(12)
        else:
            if prefix < 15:
                code = (prefix << suffix_len) + r.read(suffix_len)
            else:
                code = (15 << suffix_len) + r.read(12)
        if first and t1 < 3:
            code += 2
        first = False
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # levels[] is high-frequency-first; positions via total_zeros/runs
    if total_coeff < max_coeff:
        tz_tab = _CAVLC_TOTAL_ZEROS_CDC if chroma_dc \
            else _CAVLC_TOTAL_ZEROS
        tz_codes = {c: i for i, c in enumerate(tz_tab[total_coeff])}
        total_zeros = _vlc_read(r, tz_codes)
    else:
        total_zeros = 0
    zeros_left = total_zeros
    pos = total_coeff - 1 + total_zeros   # index of the highest coeff
    for i in range(total_coeff - 1):
        out[pos] = levels[i]
        if zeros_left > 0:
            rb = {c: j for j, c in
                  enumerate(_CAVLC_RUN_BEFORE[min(zeros_left, 7)])}
            run = _vlc_read(r, rb)
        else:
            run = 0
        zeros_left -= run
        pos -= run + 1
    out[pos] = levels[total_coeff - 1]
    return out


_H264_ZIGZAG_4x4 = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                    (0, 3), (1, 2), (2, 1), (3, 0), (3, 1), (2, 2),
                    (1, 3), (2, 3), (3, 2), (3, 3)]
_H264_DC_V0 = [10, 11, 13, 14, 16, 18]   # normAdjust4x4(m, (0,0))
_HADAMARD_4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                        [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)


def _h264_dc_scale(f: np.ndarray, qp: int) -> np.ndarray:
    """Luma DC dequant (spec 8.5.10): f = inverse-Hadamard output."""
    ls = 16 * _H264_DC_V0[qp % 6]
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    shift = 6 - qp // 6
    return (f * ls + (1 << (shift - 1))) >> shift


def encode_h264_i16_dc(img: np.ndarray, qp: int = 28) -> bytes:
    """(h, w) grayscale uint8 → one IDR I-slice NAL of ENTROPY-CODED
    I_16x16 macroblocks (mb_type 3: Intra_16x16 DC prediction,
    cbp = 0) whose luma residual rides the CAVLC-coded
    Intra16x16DCLevel block — the route past the I_PCM-only seam.

    Per MB the encoder emits a single quantized DC level t = target
    residual (exact at qp = 28, where the dequant chain is the
    identity: scale(t) = 64t and (64t + 32) >> 6 = t), with the
    prediction loop replayed exactly as the decoder runs it — so for
    images UNIFORM within each 16x16 macroblock the reconstruction is
    LOSSLESS; non-uniform macroblocks encode their rounded mean (the
    DC-only approximation, returned faithfully by the decoder).
    Chroma carries no residual (prediction-only, neutral 128 via the
    DC chain) — pair with grayscale sources.  Scope and conformance:
    nC = 0 context throughout (cbp_luma = 0 keeps every neighbouring
    AC TotalCoeff at zero); tables self-checked prefix-free and
    round-trip-fuzzed; decode parity pinned against decode_h264_islice."""
    if qp != 28:
        raise NotImplementedError(
            "H264 I16 encoder: qp=28 is the exact-identity quantizer "
            "(scale(t)=64t); other qp values need non-integer targets")
    img = np.asarray(img)
    if img.ndim == 3:
        raise ValueError("encode_h264_i16_dc takes grayscale (h, w)")
    h, w = img.shape
    mw, mh = 16 * ((w + 15) // 16), 16 * ((h + 15) // 16)
    yp = np.pad(img, ((0, mh - h), (0, mw - w)), mode="edge") \
        .astype(np.int64)
    recon = np.zeros((mh, mw), dtype=np.int64)
    wtr = _EgBitWriter()
    wtr.write(0x65, 8)                  # NAL: ref_idc=3, type=5 (IDR)
    wtr.ue(0)                           # first_mb_in_slice
    wtr.ue(7)                           # slice_type: I
    wtr.ue(0)                           # pic_parameter_set_id
    wtr.write(0, 4)                     # frame_num
    wtr.ue(0)                           # idr_pic_id
    wtr.write(0, 2)                     # dec_ref_pic_marking
    wtr.se(int(qp) - 26)                # slice_qp_delta (pps init 26)
    for mby in range(mh // 16):
        for mbx in range(mw // 16):
            y0, x0 = 16 * mby, 16 * mbx
            left_ok, top_ok = mbx > 0, mby > 0
            if left_ok and top_ok:
                pred = (int(recon[y0:y0 + 16, x0 - 1].sum()
                            + recon[y0 - 1, x0:x0 + 16].sum()) + 16) >> 5
            elif left_ok:
                pred = (int(recon[y0:y0 + 16, x0 - 1].sum()) + 8) >> 4
            elif top_ok:
                pred = (int(recon[y0 - 1, x0:x0 + 16].sum()) + 8) >> 4
            else:
                pred = 128
            target = int(np.round(yp[y0:y0 + 16, x0:x0 + 16].mean()))
            t = int(np.clip(target - pred, -255, 255))
            wtr.ue(3)                   # mb_type: I_16x16_2_0_0
            wtr.ue(0)                   # intra_chroma_pred_mode: DC
            wtr.se(0)                   # mb_qp_delta
            levels = [0] * 16
            levels[0] = t               # c00-only DC block
            cavlc_encode_block(wtr, levels)
            recon[y0:y0 + 16, x0:x0 + 16] = \
                np.clip(pred + t, 0, 255)
    body = wtr.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


def _h264_i16_pred(yp: np.ndarray, mode: int, y0: int,
                   x0: int) -> np.ndarray:
    """§8.3.3 Intra_16x16 luma prediction (r11, third wave — ALL FOUR
    modes): returns the (16, 16) prediction for the macroblock at
    (y0, x0) from the already-decoded plane ``yp``.  Modes: 0 Vertical
    (needs top), 1 Horizontal (needs left), 2 DC (neighbor average,
    128 with none), 3 Plane (§8.3.3.4, needs top + left + top-left).
    Unavailable-neighbor modes raise ValueError (a conformant encoder
    never emits them)."""
    left_ok, top_ok = x0 > 0, y0 > 0
    if mode == 2:                   # DC
        if left_ok and top_ok:
            p = (int(yp[y0:y0 + 16, x0 - 1].sum()
                     + yp[y0 - 1, x0:x0 + 16].sum()) + 16) >> 5
        elif left_ok:
            p = (int(yp[y0:y0 + 16, x0 - 1].sum()) + 8) >> 4
        elif top_ok:
            p = (int(yp[y0 - 1, x0:x0 + 16].sum()) + 8) >> 4
        else:
            p = 128
        return np.full((16, 16), p, dtype=np.int64)
    if mode == 0:                   # Vertical
        if not top_ok:
            raise ValueError("H264: Intra_16x16 vertical prediction "
                             "with no row above (nonconformant)")
        return np.tile(yp[y0 - 1, x0:x0 + 16], (16, 1)).astype(np.int64)
    if mode == 1:                   # Horizontal
        if not left_ok:
            raise ValueError("H264: Intra_16x16 horizontal prediction "
                             "with no column left (nonconformant)")
        return np.tile(yp[y0:y0 + 16, x0 - 1][:, None],
                       (1, 16)).astype(np.int64)
    if mode == 3:                   # Plane (§8.3.3.4)
        if not (top_ok and left_ok):
            raise ValueError("H264: Intra_16x16 plane prediction "
                             "needs top AND left (nonconformant)")
        top = yp[y0 - 1, x0 - 1:x0 + 16].astype(np.int64)   # p[-1..15]
        left = yp[y0 - 1:y0 + 16, x0 - 1].astype(np.int64)
        k = np.arange(1, 9, dtype=np.int64)                 # x'+1
        H = int((k * (top[1 + 8 + k - 1] - top[1 + 6 - (k - 1)])).sum())
        V = int((k * (left[1 + 8 + k - 1] - left[1 + 6 - (k - 1)])).sum())
        a = 16 * (int(left[16]) + int(top[16]))
        b = (5 * H + 32) >> 6
        c = (5 * V + 32) >> 6
        x = np.arange(16, dtype=np.int64)
        grid = a + b * (x[None, :] - 7) + c * (x[:, None] - 7) + 16
        return np.clip(grid >> 5, 0, 255)
    raise ValueError(f"H264: Intra_16x16 prediction mode {mode}")


def _h264_chroma_pred(pl: np.ndarray, mode: int, y0: int,
                      x0: int) -> np.ndarray:
    """§8.3.4 intra CHROMA prediction (8x8, 4:2:0): returns the (8, 8)
    prediction for the chroma block at (y0, x0) of plane ``pl``.
    Chroma mode numbering (≠ luma!): 0 DC (per-4x4-quadrant neighbor
    rules, §8.3.4.1), 1 Horizontal, 2 Vertical, 3 Plane (§8.3.4.4
    with the 34·H/34·V fit).  Unavailable-neighbor modes raise."""
    left_ok, top_ok = x0 > 0, y0 > 0
    out = np.empty((8, 8), dtype=np.int64)
    if mode == 0:                   # DC, per 4x4 quadrant
        def s_top(lo):
            return int(pl[y0 - 1, x0 + lo:x0 + lo + 4].sum())

        def s_left(lo):
            return int(pl[y0 + lo:y0 + lo + 4, x0 - 1].sum())
        for qy in (0, 4):
            for qx in (0, 4):
                corner = (qx == 0) == (qy == 0)   # (0,0) and (4,4)
                if corner and left_ok and top_ok:
                    v = (s_top(qx) + s_left(qy) + 4) >> 3
                elif (qx == 4 and qy == 0 and top_ok) or \
                        (corner and top_ok and not left_ok):
                    v = (s_top(qx) + 2) >> 2
                elif (qx == 0 and qy == 4 and left_ok) or \
                        (corner and left_ok and not top_ok):
                    v = (s_left(qy) + 2) >> 2
                elif left_ok:       # fallbacks for the off-corners
                    v = (s_left(qy) + 2) >> 2
                elif top_ok:
                    v = (s_top(qx) + 2) >> 2
                else:
                    v = 128
                out[qy:qy + 4, qx:qx + 4] = v
        return out
    if mode == 1:                   # Horizontal
        if not left_ok:
            raise ValueError("H264: chroma horizontal prediction with "
                             "no column left (nonconformant)")
        return np.tile(pl[y0:y0 + 8, x0 - 1][:, None],
                       (1, 8)).astype(np.int64)
    if mode == 2:                   # Vertical
        if not top_ok:
            raise ValueError("H264: chroma vertical prediction with "
                             "no row above (nonconformant)")
        return np.tile(pl[y0 - 1, x0:x0 + 8], (8, 1)).astype(np.int64)
    if mode == 3:                   # Plane (§8.3.4.4)
        if not (top_ok and left_ok):
            raise ValueError("H264: chroma plane prediction needs top "
                             "AND left (nonconformant)")
        top = pl[y0 - 1, x0 - 1:x0 + 8].astype(np.int64)
        left = pl[y0 - 1:y0 + 8, x0 - 1].astype(np.int64)
        k = np.arange(1, 5, dtype=np.int64)
        H = int((k * (top[4 + k] - top[4 - k])).sum())
        V = int((k * (left[4 + k] - left[4 - k])).sum())
        a = 16 * (int(left[8]) + int(top[8]))
        b = (34 * H + 32) >> 6
        c = (34 * V + 32) >> 6
        x = np.arange(8, dtype=np.int64)
        grid = a + b * (x[None, :] - 3) + c * (x[:, None] - 3) + 16
        return np.clip(grid >> 5, 0, 255)
    raise ValueError(f"H264: chroma prediction mode {mode}")


def encode_h264_i16_modes(width: int, height: int, modes: np.ndarray,
                          offsets: np.ndarray, qp: int = 28,
                          chroma_modes: np.ndarray | None = None,
                          chroma_offsets: np.ndarray | None = None
                          ) -> tuple:
    """One IDR I-slice NAL of I_16x16 macroblocks exercising ALL FOUR
    §8.3.3 prediction modes (r11, third wave): per MB, mb_type =
    1 + modes[mby, mbx] (0 V / 1 H / 2 DC / 3 Plane) plus a DC-coded
    uniform luma residual offsets[mby, mbx] (any integer — the qp=28
    identity chain).  The encoder replays the decoder's exact
    prediction loop, so the CONSTRUCTED picture is part of the return:
    ``(nal, luma)`` with ``luma`` the (height, width) uint8 plane the
    decoder must reproduce bit-exactly.  Availability is validated
    (V needs a row above, H a column left, Plane both).

    ``chroma_modes`` (§8.3.4 numbering: 0 DC / 1 H / 2 V / 3 Plane)
    with ``chroma_offsets`` (mbh, mbw, 2) — per-MB uniform (Cb, Cr)
    residuals, multiples of 2 — additionally code intra CHROMA:
    cbp_chroma = 1 (ChromaDCLevel-only), COLORED intra frames without
    I_PCM.  The return becomes ``(nal, (luma, cb, cr))``."""
    if qp != 28:
        raise NotImplementedError("H264 I16 encoder: qp=28 only")
    if width % 16 or height % 16:
        raise ValueError("encode_h264_i16_modes: multiple-of-16 "
                         "dimensions only")
    mbw, mbh = width // 16, height // 16
    modes = np.asarray(modes, dtype=np.int64)
    offs = np.asarray(offsets, dtype=np.int64)
    if modes.shape != (mbh, mbw) or offs.shape != (mbh, mbw):
        raise ValueError(f"modes/offsets must be ({mbh}, {mbw})")
    if np.abs(offs).max() > 255:
        raise ValueError("|offset| > 255")
    do_chroma = chroma_modes is not None
    if do_chroma:
        cmodes = np.asarray(chroma_modes, dtype=np.int64)
        coffs = np.asarray(chroma_offsets, dtype=np.int64)
        if cmodes.shape != (mbh, mbw) or coffs.shape != (mbh, mbw, 2):
            raise ValueError(f"chroma modes must be ({mbh}, {mbw}), "
                             f"offsets ({mbh}, {mbw}, 2)")
        if (coffs % 2).any():
            raise ValueError("chroma residual values must be "
                             "multiples of 2 (DC-only qp=28 step)")
    recon = np.zeros((height, width), dtype=np.int64)
    creco = [np.zeros((height // 2, width // 2), dtype=np.int64)
             for _ in range(2)]
    wtr = _EgBitWriter()
    wtr.write(0x65, 8)                  # NAL: ref_idc=3, type=5 (IDR)
    wtr.ue(0)                           # first_mb_in_slice
    wtr.ue(7)                           # slice_type: I
    wtr.ue(0)                           # pic_parameter_set_id
    wtr.write(0, 4)                     # frame_num
    wtr.ue(0)                           # idr_pic_id
    wtr.write(0, 2)                     # dec_ref_pic_marking
    wtr.se(int(qp) - 26)                # slice_qp_delta (pps init 26)
    for mby in range(mbh):
        for mbx in range(mbw):
            y0, x0 = 16 * mby, 16 * mbx
            mode = int(modes[mby, mbx])
            t = int(offs[mby, mbx])
            pred = _h264_i16_pred(recon, mode, y0, x0)
            cbp_chroma = 1 if do_chroma else 0
            wtr.ue(1 + mode + 4 * cbp_chroma)   # mb_type
            wtr.ue(int(cmodes[mby, mbx]) if do_chroma else 0)
            wtr.se(0)                   # mb_qp_delta
            levels = [0] * 16
            levels[0] = t               # c00-only DC block
            cavlc_encode_block(wtr, levels)
            recon[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + t, 0, 255)
            if do_chroma:               # ChromaDCLevel: Cb then Cr
                cy0, cx0 = 8 * mby, 8 * mbx
                for pi in (0, 1):
                    cv = int(coffs[mby, mbx, pi]) // 2
                    cavlc_encode_block(wtr, [cv, 0, 0, 0],
                                       chroma_dc=True)
                    cpred = _h264_chroma_pred(
                        creco[pi], int(cmodes[mby, mbx]), cy0, cx0)
                    creco[pi][cy0:cy0 + 8, cx0:cx0 + 8] = \
                        np.clip(cpred + 2 * cv, 0, 255)
            else:                       # prediction-only neutral 128
                cy0, cx0 = 8 * mby, 8 * mbx
                for pi in (0, 1):
                    creco[pi][cy0:cy0 + 8, cx0:cx0 + 8] = \
                        _h264_chroma_pred(creco[pi], 0, cy0, cx0)
    body = wtr.bytes_aligned()
    nal = body[:1] + _insert_emulation(body[1:])
    if do_chroma:
        return nal, (recon.astype(np.uint8),
                     creco[0].astype(np.uint8),
                     creco[1].astype(np.uint8))
    return nal, recon.astype(np.uint8)


def decode_h264_islice(nal: bytes, width: int, height: int) -> np.ndarray:
    """One IDR/non-IDR I-slice NAL → (height, width, 3) uint8 RGB.
    Decodes BOTH macroblock routes this library emits: I_PCM (raw
    samples) and ENTROPY-CODED I_16x16 with DC prediction and
    CAVLC-coded DC residual (mb_type 1-4 with cbp = 0; mb_type 3's DC
    prediction implemented, V/H/plane and any cbp != 0 or I_4x4 type
    raise NotImplementedError — the documented remaining seam is now
    AC residuals + non-DC prediction, no longer entropy coding
    itself)."""
    return _h264_planes_to_rgb(
        *decode_h264_islice_planes(nal, width, height), width, height)


def decode_h264_islice_planes(nal: bytes, width: int, height: int):
    """decode_h264_islice's PLANE-domain form: returns the padded
    ``(Y (mh, mw), Cb, Cr (mh/2, mw/2))`` uint8 planes — the decoded
    picture the INTER prediction chain references (r11: fractional
    motion interpolates these planes, never the RGB render)."""
    data = _strip_emulation(bytes(nal))
    if not data or (data[0] & 0x1F) not in (1, 5):
        raise ValueError("H264: not a slice NAL")
    idr = (data[0] & 0x1F) == 5
    r = _EgBitReader(data[1:])
    if r.ue() != 0:
        raise ValueError("H264: multi-slice pictures unsupported")
    stype = r.ue()
    if stype % 5 != 2:
        raise NotImplementedError(
            "H264: only I slices decode natively (P/B prediction needs "
            "ffmpeg)")
    r.ue()                              # pic_parameter_set_id
    r.read(4)                           # frame_num
    if idr:
        r.ue()
        r.read(2)
    qp = 26 + r.se()                    # slice_qp_delta over pps init
    mw, mh = 16 * ((width + 15) // 16), 16 * ((height + 15) // 16)
    yp = np.zeros((mh, mw), dtype=np.int64)
    cbs = np.full((mh // 2, mw // 2), 128, dtype=np.uint8)
    crs = np.full((mh // 2, mw // 2), 128, dtype=np.uint8)
    pcm_any = False
    for mby in range(mh // 16):
        for mbx in range(mw // 16):
            y0, x0 = 16 * mby, 16 * mbx
            mb_type = r.ue()
            if mb_type == 25:           # I_PCM
                pcm_any = True
                while r.pos % 8:
                    if r.read(1):
                        raise ValueError("H264: nonzero PCM alignment")
                at = 1 + (r.pos >> 3)
                if at + 384 > len(data):
                    raise ValueError("H264: truncated I_PCM macroblock")
                mb = np.frombuffer(data, dtype=np.uint8,
                                   offset=at, count=384)
                yp[y0:y0 + 16, x0:x0 + 16] = mb[:256].reshape(16, 16)
                cbs[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                    mb[256:320].reshape(8, 8)
                crs[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                    mb[320:384].reshape(8, 8)
                r.pos += 384 * 8
                continue
            if not 1 <= mb_type <= 24:
                raise NotImplementedError(
                    f"H264: mb_type {mb_type} — only I_16x16 (types "
                    "1-24) and I_PCM decode natively (I_4x4 is the "
                    "remaining seam)")
            pred_mode = (mb_type - 1) % 4   # 0=V 1=H 2=DC 3=Plane
            cbp_chroma = ((mb_type - 1) // 4) % 3
            cbp_luma15 = (mb_type - 1) >= 12
            if cbp_chroma == 2:
                raise NotImplementedError(
                    "H264: intra chroma AC residuals remain the seam "
                    "(cbp_chroma == 2; DC-only cbp_chroma == 1 "
                    "decodes)")
            cpm = r.ue()                # intra_chroma_pred_mode
            qp += r.se()                # mb_qp_delta
            levels = cavlc_decode_block(r, 16)
            c = np.zeros((4, 4), dtype=np.int64)
            for lv, (zi, zj) in zip(levels, _H264_ZIGZAG_4x4):
                c[zi, zj] = lv
            f = _HADAMARD_4 @ c @ _HADAMARD_4
            dc = _h264_dc_scale(f, qp)
            ac_blocks = None
            if cbp_luma15:
                ac_blocks = []
                for _blk in range(16):
                    ac = cavlc_decode_block(r, 15)
                    cb4 = np.zeros((4, 4), dtype=np.int64)
                    for lv, (zi, zj) in zip(ac, _H264_ZIGZAG_4x4[1:]):
                        cb4[zi, zj] = lv
                    ac_blocks.append(cb4)
            if cbp_chroma:              # ChromaDCLevel (§8.5.11) + the
                qpc = _h264_chroma_qp(qp)   # §8.3.4 chroma prediction
                cy0, cx0 = 8 * mby, 8 * mbx
                for pl in (cbs, crs):
                    lv = cavlc_decode_block(r, 4, chroma_dc=True)
                    c2 = np.array([[lv[0], lv[1]], [lv[2], lv[3]]],
                                  dtype=np.int64)
                    f2 = _H2X2 @ c2 @ _H2X2
                    dcc = (f2 * (16 * _H264_DC_V0[qpc % 6])
                           << (qpc // 6)) >> 5
                    cpred = _h264_chroma_pred(pl, cpm, cy0, cx0)
                    for by in range(2):
                        for bx in range(2):
                            val = (int(dcc[by, bx]) + 32) >> 6
                            pl[cy0 + 4 * by:cy0 + 4 * by + 4,
                               cx0 + 4 * bx:cx0 + 4 * bx + 4] = \
                                np.clip(cpred[4 * by:4 * by + 4,
                                              4 * bx:4 * bx + 4]
                                        + val, 0, 255)
            # §8.3.3 Intra_16x16 prediction, all four modes (r11)
            pred = _h264_i16_pred(yp, pred_mode, y0, x0)
            if ac_blocks is None:
                for bi in range(4):
                    for bj in range(4):
                        res = (int(dc[bi, bj]) + 32) >> 6
                        blk = np.clip(
                            pred[4 * bi:4 * bi + 4,
                                 4 * bj:4 * bj + 4] + res, 0, 255)
                        yp[y0 + 4 * bi:y0 + 4 * bi + 4,
                           x0 + 4 * bj:x0 + 4 * bj + 4] = blk
            else:
                for (by, bx), cb4 in zip(_H264_BLK_ORDER, ac_blocks):
                    d = _h264_ac_dequant(cb4, qp)
                    d[0, 0] = int(dc[by, bx])
                    rblk = (_h264_inv_core4(d) + 32) >> 6
                    yp[y0 + 4 * by:y0 + 4 * by + 4,
                       x0 + 4 * bx:x0 + 4 * bx + 4] = \
                        np.clip(pred[4 * by:4 * by + 4,
                                     4 * bx:4 * bx + 4] + rblk, 0, 255)
    _ = pcm_any
    return (np.clip(yp, 0, 255).astype(np.uint8), cbs, crs)


# --- I_16x16 with sparse AC residuals (cbp_luma = 15, nC < 2 kept) --------
_H264_AC_V1 = [16, 18, 20, 23, 25, 29]   # normAdjust4x4, class (0,2)-type
_H264_AC_V2 = [13, 14, 16, 18, 20, 23]   # normAdjust4x4, class (1,1)-type


def _h264_levelscale(qp: int, i: int, j: int) -> int:
    m = qp % 6
    if (i, j) in ((0, 0), (0, 2), (2, 0), (2, 2)):
        v = _H264_DC_V0[m]
    elif (i, j) in ((1, 1), (1, 3), (3, 1), (3, 3)):
        v = _H264_AC_V2[m]
    else:
        v = _H264_AC_V1[m]
    return 16 * v


def _h264_ac_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    """Residual 4x4 dequant (8.5.12.1 form); c[0,0] is the DC slot the
    caller fills from the Hadamard plane."""
    ls = np.array([[_h264_levelscale(qp, i, j) for j in range(4)]
                   for i in range(4)], dtype=np.int64)
    if qp >= 24:
        return (c * ls) << (qp // 6 - 4)
    shift = 4 - qp // 6
    return (c * ls + (1 << (shift - 1))) >> shift


def _h264_inv_core4(d: np.ndarray) -> np.ndarray:
    """Integer inverse 4x4 core transform (8.5.12.2) WITHOUT the final
    (x + 32) >> 6 — the caller applies it after both passes."""
    def pass1(m):
        e0 = m[0] + m[2]
        e1 = m[0] - m[2]
        e2 = (m[1] >> 1) - m[3]
        e3 = m[1] + (m[3] >> 1)
        return np.array([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    g = np.stack([pass1(d[:, j]) for j in range(4)], axis=1)
    h = np.stack([pass1(g[i, :]) for i in range(4)], axis=0)
    return h


# luma4x4BlkIdx -> (y4, x4) offsets in 4-pixel units (8x8 quadrant scan)
_H264_BLK_ORDER = [
    (0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2), (1, 3),
    (2, 0), (2, 1), (3, 0), (3, 1), (2, 2), (2, 3), (3, 2), (3, 3)]


def encode_h264_i16_ac(img: np.ndarray, qp: int = 28) -> bytes:
    """(h, w) grayscale → IDR I-slice NAL of CAVLC I_16x16 macroblocks
    WITH luma AC residuals (mb_type 15: DC prediction, cbp_luma = 15).

    A real sparse-AC encoder: per 4x4 block the residual's best single
    AC basis coefficient (by integer-reconstruction least squares) plus
    the DC plane.  Capping every AC block at ONE nonzero coefficient
    keeps ALL TotalCoeff <= 1, hence every nC = (nA+nB+1)>>1 <= 1 —
    the whole stream stays inside the verified nC < 2 CAVLC table
    (the sparse-AC operating point; dense-AC nC >= 2 contexts remain
    the documented seam).  Lossy in general; decode_h264_islice
    reproduces THIS function's reconstruction exactly (pinned by test
    via the returned stream).  qp=28 identity DC quantizer as in
    encode_h264_i16_dc."""
    if qp != 28:
        raise NotImplementedError("sparse-AC encoder: qp=28 only")
    img = np.asarray(img)
    if img.ndim == 3:
        raise ValueError("encode_h264_i16_ac takes grayscale (h, w)")
    h, w = img.shape
    mw, mh = 16 * ((w + 15) // 16), 16 * ((h + 15) // 16)
    yp = np.pad(img, ((0, mh - h), (0, mw - w)), mode="edge") \
        .astype(np.int64)
    recon = np.zeros((mh, mw), dtype=np.int64)
    # integer reconstruction basis of a unit level at each zigzag pos
    bases = {}
    for p in range(1, 16):
        c = np.zeros((4, 4), dtype=np.int64)
        c[_H264_ZIGZAG_4x4[p]] = 1
        bases[p] = _h264_inv_core4(_h264_ac_dequant(c, qp)).astype(
            np.float64)
    wtr = _EgBitWriter()
    wtr.write(0x65, 8)
    wtr.ue(0)
    wtr.ue(7)
    wtr.ue(0)
    wtr.write(0, 4)
    wtr.ue(0)
    wtr.write(0, 2)
    wtr.se(int(qp) - 26)
    for mby in range(mh // 16):
        for mbx in range(mw // 16):
            y0, x0 = 16 * mby, 16 * mbx
            left_ok, top_ok = mbx > 0, mby > 0
            if left_ok and top_ok:
                pred = (int(recon[y0:y0 + 16, x0 - 1].sum()
                            + recon[y0 - 1, x0:x0 + 16].sum()) + 16) >> 5
            elif left_ok:
                pred = (int(recon[y0:y0 + 16, x0 - 1].sum()) + 8) >> 4
            elif top_ok:
                pred = (int(recon[y0 - 1, x0:x0 + 16].sum()) + 8) >> 4
            else:
                pred = 128
            mb = yp[y0:y0 + 16, x0:x0 + 16]
            t_dc = int(np.clip(int(np.round(mb.mean())) - pred,
                               -255, 255))
            wtr.ue(15)                  # I_16x16_2_0_1: DC pred, cbp 15
            wtr.ue(0)                   # chroma pred DC
            wtr.se(0)                   # mb_qp_delta
            dc_levels = [0] * 16
            dc_levels[0] = t_dc
            cavlc_encode_block(wtr, dc_levels)
            # per-4x4: pick the single best AC coefficient
            ac_choices = []
            for (by, bx) in _H264_BLK_ORDER:
                blk = mb[4 * by:4 * by + 4, 4 * bx:4 * bx + 4]
                res = blk - (pred + t_dc)
                best = (0, 0)           # (pos, level)
                best_err = float((res.astype(np.float64) ** 2).sum())
                for p in (1, 2, 3):     # low-frequency AC candidates
                    b = bases[p]
                    denom = float((b * b).sum())
                    lvl = int(np.round(64.0 * float((res * b).sum())
                                       / denom))
                    for cand in (lvl - 1, lvl, lvl + 1):
                        if cand == 0 or abs(cand) > 2047:
                            continue
                        rec = (cand * bases[p] + 32.0) // 64.0
                        err = float(((res - rec) ** 2).sum())
                        if err < best_err:
                            best, best_err = (p, cand), err
                ac = [0] * 15
                if best[1] != 0:
                    ac[best[0] - 1] = best[1]
                cavlc_encode_block(wtr, ac)
                ac_choices.append(best)
            # reconstruct exactly as the decoder will
            for (by, bx), (p, lvl) in zip(_H264_BLK_ORDER, ac_choices):
                c = np.zeros((4, 4), dtype=np.int64)
                if lvl:
                    c[_H264_ZIGZAG_4x4[p]] = lvl
                d = _h264_ac_dequant(c, qp)
                d[0, 0] = 64 * t_dc     # qp=28: dcY = 64*t, spread later
                r = (_h264_inv_core4(d) + 32) >> 6
                recon[y0 + 4 * by:y0 + 4 * by + 4,
                      x0 + 4 * bx:x0 + 4 * bx + 4] = \
                    np.clip(pred + r, 0, 255)
    body = wtr.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


# ---------------------------------------------------------------------------
# AAC-LC (ISO/IEC 14496-3 §4) — the mp4a payload route (r10, VERDICT r9
# ask #6).  Implemented from the public spec math, first principles:
#
#   * raw_data_block / SCE / ics_info / section_data SYNTAX walk
#     (§4.4.1-4.4.2), FIL skipping, END + byte alignment;
#   * the complete sub-entropy DECODE pipELINE: inverse quantization
#     sign(q)·|q|^(4/3) (§4.6.2), scalefactor gains 2^{0.25·(sf−100)}
#     (§4.6.3), the N=2048 long-window IMDCT with sine and
#     Kaiser-Bessel-derived windows and 50% overlap-add (§4.6.11) —
#     all pinned by closed forms (TDAC perfect reconstruction,
#     single-bin cosine) in tests;
#   * Huffman-FREE frames decode end to end: all-ZERO_HCB sections (or
#     max_sfb = 0) carry no scalefactor/spectral Huffman codes, so a
#     conformant digital-silence frame with a real per-frame
#     global_gain parses and synthesizes natively.
#
# THE REMAINING SEAM, narrowed again in r11: the ENTIRE Huffman-layer
# decode pipeline now exists (see the registry note further down —
# section walk over arbitrary codebooks, DPCM scalefactors, n-tuple
# spectral codewords with sign bits and §4.6.3 escapes, per-band
# dequantization, all gated under media_aac_huff with the
# engine-defined codebook profile).  What remains is pure DATA: the
# normative codeword tables (14496-3 Tables 4.A.2-4.A.12) and
# per-rate swb_offset band tables are hundreds of explicit constants
# that cannot be re-derived from first principles (they are not
# canonical codes) and have no source in this container.  Reproducing
# them from memory risks a silently NONCONFORMANT codec that only
# round-trips against itself — worse than an honest seam — so real
# streams still raise until the tables are dropped in as
# AacCodebook/swb_offsets data, and the raise says exactly that.

# QPc from qPi (Table 8-15; chroma_qp_index_offset = 0, the PPS this
# module emits): identity below 30, then the compressed tail.
_H264_QPC_TAIL = {30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33,
                  36: 34, 37: 34, 38: 35, 39: 35, 40: 36, 41: 36,
                  42: 37, 43: 37, 44: 37, 45: 38, 46: 38, 47: 38,
                  48: 39, 49: 39, 50: 39, 51: 39}
_H2X2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def _h264_chroma_qp(qp: int) -> int:
    qpi = min(max(qp, 0), 51)
    return qpi if qpi < 30 else _H264_QPC_TAIL[qpi]


