"""JVM-side binary-container header parsing for multimodal columns.

The multimodal operators (``operators/multimodal.py``) treat media as
opaque ``binary`` payloads + a typed ``meta`` struct. These functions
read the meta FROM THE BYTES with pure Catalyst expressions — binary
``substring`` slices + ``conv(hex(...))`` integer decodes — so header
validation/extraction over billions of rows is map-only, codegen'd,
and never crosses into Python (the decode KERNELS stay in
``operators/codecs.py``; this is just the fixed-offset header math).

Layouts (public specs):
  PNG  — 8-byte signature, then the IHDR chunk at a FIXED offset:
         length(4) 'IHDR'(4) width(4 BE) height(4 BE) bit_depth(1)
         color_type(1) — www.w3.org/TR/png-3 §11.2.1
  WAV  — RIFF(4) size(4) 'WAVE'(4) 'fmt '(4) size(4) format(2 LE)
         channels(2 LE @23) sample_rate(4 LE @25) ... bits(2 LE @35)
         (canonical 44-byte PCM header)

All positions below are 1-based (Spark substring convention).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PNG_SIG_HEX = "89504E470D0A1A0A"
_IHDR_HEX = "49484452"  # "IHDR"


def _u8(p: Column, pos: int) -> Column:
    return F.conv(F.hex(F.substring(p, pos, 1)), 16, 10).cast("int")


def _guard_int(v: Column) -> Column:
    """long → int with an overflow GUARD, not a cast: under ANSI mode
    (this engine's session default) a raw cast of a bit-31 value would
    THROW and kill the job — in a function meant for header
    *validation* of untrusted binary, out-of-int-range fields must
    surface as NULL (mismatch), never as a stage abort."""
    return F.when(v <= F.lit(0x7FFFFFFF), v.cast("int"))


def _be_u32(p: Column, pos: int) -> Column:
    """Big-endian u32 — hex of the 4-byte slice IS the big-endian
    number, so one conv does it."""
    return _guard_int(F.conv(F.hex(F.substring(p, pos, 4)), 16, 10).cast("long"))


def _le_uint(p: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int: per-byte decode × 256^i sum."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        out = out + _u8(p, pos + i).cast("long") * F.lit(256**i)
    return _guard_int(out)


def is_png(p: Column | str) -> Column:
    p = F.col(p) if isinstance(p, str) else p
    return (F.hex(F.substring(p, 1, 8)) == _PNG_SIG_HEX) & (
        F.hex(F.substring(p, 13, 4)) == _IHDR_HEX
    )


def png_meta(p: Column | str) -> Column:
    """(width, height, bit_depth, color_type, channels) struct decoded
    from PNG IHDR bytes; NULL for non-PNG payloads."""
    p = F.col(p) if isinstance(p, str) else p
    color_type = _u8(p, 26)
    channels = (
        F.when(color_type == 0, 1)   # greyscale
        .when(color_type == 2, 3)    # truecolor
        .when(color_type == 3, 1)    # palette (1 index byte)
        .when(color_type == 4, 2)    # grey + alpha
        .when(color_type == 6, 4)    # RGBA
    )
    meta = F.struct(
        _be_u32(p, 17).alias("width"),
        _be_u32(p, 21).alias("height"),
        _u8(p, 25).alias("bit_depth"),
        color_type.alias("color_type"),
        channels.alias("channels"),
    )
    return F.when(is_png(p), meta)


def is_wav(p: Column | str) -> Column:
    p = F.col(p) if isinstance(p, str) else p
    return (F.hex(F.substring(p, 1, 4)) == "52494646") & (  # "RIFF"
        F.hex(F.substring(p, 9, 8)) == "57415645666D7420"   # "WAVEfmt "
    )


def wav_meta(p: Column | str) -> Column:
    """(sample_rate, channels, bits_per_sample) struct from the
    canonical PCM WAV header; NULL for non-WAV payloads."""
    p = F.col(p) if isinstance(p, str) else p
    meta = F.struct(
        _le_uint(p, 25, 4).alias("sample_rate"),
        _le_uint(p, 23, 2).alias("channels"),
        _le_uint(p, 35, 2).alias("bits_per_sample"),
    )
    return F.when(is_wav(p), meta)


# MP4 stub layout (operators/codecs.encode_mp4_stub writes constant box
# sizes): 0-based type-field offsets ftyp@4 moov@24 mvhd@32 tkhd@148
# stsz@296. The general variable-layout demuxer is the Python box walk
# (codecs.parse_mp4_meta); this JVM twin decodes the ENGINE-WRITTEN
# fixed layout with pure Catalyst expressions — header-validation of
# generated containers without a Python worker in the plan.
_FTYP_HEX = "66747970"  # "ftyp"
_MOOV_HEX = "6D6F6F76"  # "moov"
_MVHD_HEX = "6D766864"  # "mvhd"
_TKHD_HEX = "746B6864"  # "tkhd"
_STSZ_HEX = "7374737A"  # "stsz"


def is_mp4_stub(p: Column | str) -> Column:
    p = F.col(p) if isinstance(p, str) else p
    return (
        (F.hex(F.substring(p, 5, 4)) == _FTYP_HEX)
        & (F.hex(F.substring(p, 25, 4)) == _MOOV_HEX)
        & (F.hex(F.substring(p, 33, 4)) == _MVHD_HEX)
        & (F.hex(F.substring(p, 149, 4)) == _TKHD_HEX)
        & (F.hex(F.substring(p, 297, 4)) == _STSZ_HEX)
    )


def mp4_meta(p: Column | str) -> Column:
    """(width, height, n_frames, timescale, duration_units) struct from
    the fixed stub layout; NULL for anything else. tkhd width/height
    are 16.16 fixed point — the high 16 bits are the integer part."""
    p = F.col(p) if isinstance(p, str) else p
    meta = F.struct(
        _guard_int(F.conv(F.hex(F.substring(p, 229, 2)), 16, 10).cast("long")).alias("width"),
        _guard_int(F.conv(F.hex(F.substring(p, 233, 2)), 16, 10).cast("long")).alias("height"),
        _be_u32(p, 309).alias("n_frames"),
        _be_u32(p, 49).alias("timescale"),
        _be_u32(p, 53).alias("duration_units"),
    )
    return F.when(is_mp4_stub(p), meta)
