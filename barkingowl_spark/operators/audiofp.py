"""Audio landmark fingerprinting and snippet matching (Wang, "An
Industrial-Strength Audio Search Algorithm", ISMIR 2003 — the Shazam
constellation scheme), as multimodal-column plumbing + relational
matching.

Pipeline (the real thing and this implementation, stage for stage):

  decode -> spectrogram peaks     (t, f) constellation per track
  peaks  -> landmark hashes       pair each peak with the next few
                                  peaks in a target zone; hash
                                  (f1, f2, dt) — translation-invariant
  hashes -> inverted index        (h -> track, t1)
  query  -> same hashes -> join   histogram of (track, t_track -
                                  t_query); a tall bin IS a match
                                  (time-coherent hash agreement)

WAV/PCM payloads DECODE FOR REAL (r03, the pngcodec convention):
RIFF/WAVE needs nothing beyond stdlib struct — decode_wav_pcm parses
fmt/data chunks (PCM 16- AND 24-bit since r4; interleaved frames
downmix to the floor-mean of the channels) —
and _peaks_real computes an exact-integer spectral constellation:
64-sample frames at hop 32, WALSH-HADAMARD sequency energies
(coef(k) = sum_j s[j] * (-1)^popcount(j AND k) — the +-1-basis
spectral transform, integer-exact, and reproducible in plain SQL via
bit_count parity), peak = strict-rise/non-rise local max IN TIME per
sequency band k = 1..63 (DC excluded). Per-payload magic dispatch:
b'RIFF' -> real pixels-equivalent path; anything else falls to
_peaks_stub, the deterministic byte fake for formats whose codecs
this container genuinely lacks (MP3/AAC/ffmpeg) — schema, Arrow
batching, partitioning, and every relational stage downstream are
identical on both paths (the operators/multimodal.py convention).

Scale shape: peaks are a mapInPandas over the audio table (payloads
read ONCE, never shuffled); landmarks are a per-track self-join bounded
by max_dt and a per-(track,t1) fan-out cap (WindowGroupLimit);
matching is ONE equi-join on the landmark hash + ONE map-side-combined
(query, track, offset) count — the vote histogram — and the per-query
winner is a query-partitioned top-1 window. The track index side is
built once and reused across query batches.

No reference counterpart (/root/reference is empty, SURVEY §0); pinned
by tests/test_audiofp.py's independent Python reimplementation and the
audio_landmarks / audio_match DuckDB oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HAVE_CODEC = False  # no COMPRESSED-audio codec here (by design);
#                      PCM WAV decodes for real via decode_wav_pcm

FRAME = 64   # WHT frame length (power of two)
HOP = 32


def encode_wav_pcm(
    channels: list[list[int]], rate: int = 8000, bits: int = 16,
    extensible: bool = False,
) -> bytes:
    """Interleaved multi-channel PCM WAV writer (8-, 16- or 24-bit,
    RIFF/fmt/data) — the fixture generator for the real decode path;
    samples clamp to the sample width (8-bit stores UNSIGNED
    int16 >> 8 + 128, the format's convention). extensible wraps
    the fmt chunk as WAVE_FORMAT_EXTENSIBLE (0xFFFE + the 22-byte
    extension carrying the PCM SubFormat GUID) — what every
    multichannel/pro writer emits."""
    import struct

    if not channels or not channels[0]:
        raise ValueError("no samples")
    if bits not in (8, 16, 24):
        raise ValueError("bits must be 8, 16 or 24")
    n_ch, nfr = len(channels), len(channels[0])
    if any(len(c) != nfr for c in channels):
        raise ValueError("ragged channels")
    bw = bits // 8
    parts = []
    for i in range(nfr):
        for ch in channels:
            s = int(ch[i])
            if bits == 16:
                s = max(-32768, min(32767, s))
                parts.append(struct.pack("<h", s))
            elif bits == 8:
                s = max(-32768, min(32767, s))
                parts.append(bytes([(s >> 8) + 128]))
            else:
                s = max(-(1 << 23), min((1 << 23) - 1, s))
                parts.append((s & 0xFFFFFF).to_bytes(3, "little"))
    data = b"".join(parts)
    if extensible:
        fmt = (struct.pack("<HHIIHH", 0xFFFE, n_ch, rate,
                           rate * n_ch * bw, n_ch * bw, bits)
               + struct.pack("<HHI", 22, bits, 0)
               + struct.pack("<I", 1) + _KS_GUID_TAIL)
    else:
        fmt = struct.pack("<HHIIHH", 1, n_ch, rate,
                          rate * n_ch * bw, n_ch * bw, bits)
    return (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    """Mono PCM-16 WAV writer — encode_wav_pcm([samples])."""
    return encode_wav_pcm([samples], rate=rate, bits=16)


#: KSDATAFORMAT SubFormat GUID tail shared by every standard WAV
#: subformat (PCM/ADPCM/ALAW/MULAW...): only the first dword varies.
_KS_GUID_TAIL = bytes.fromhex("000010008000 00AA00389B71".replace(
    " ", ""))


def ulaw_to_linear(u: int) -> int:
    """ITU-T G.711 mu-law byte -> linear int16 — the CLOSED-FORM
    spec expansion (invert, 4-bit mantissa + bias 0x84, shift by
    the 3-bit segment, re-bias). Unlike the QM-coder's empirical
    state table, this is pure arithmetic a SQL oracle can recompute
    — and the stdlib audioop module pins all 256 codes in tests."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def alaw_to_linear(a: int) -> int:
    """ITU-T G.711 A-law byte -> linear int16 (even-bit inversion
    0x55, segment 0 special-cased, sign bit set = positive)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def decode_wav_pcm(payload: bytes) -> list[int]:
    """RIFF/WAVE -> int16-scale samples. PCM (format 1) at 8, 16 or
    24 bits (8-bit WAV is UNSIGNED, (b - 128) << 8; 24-bit samples
    arithmetic-shift down 8 (>> 8, floor) onto the 16-bit scale);
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves the real code from the
    SubFormat GUID's first dword with the KSDATAFORMAT tail
    enforced; G.711 A-law (format 6) and
    mu-law (format 7) at 8 bits expand per the closed-form spec
    formulas (r5 third session — the earlier same-reasoning-as-QM
    stub was too broad: G.711 is formula, not empirical table, so
    it IS independently verifiable here, by the SQL oracle and by
    stdlib audioop); multi-channel frames downmix to the floor-mean
    of the channels (sum DIV n_ch, Python floor — a fixture with
    ch = s +/- e makes the mix exactly s, parity-free). Remaining
    compressed/float formats raise NotImplementedError (their
    codecs are the genuine environment gap), corrupt containers
    ValueError."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, bits, fmt_code, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt_code, n_ch = struct.unpack("<HH", body[:4])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_code == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: the real code lives in
                # the first dword of the SubFormat GUID; the tail
                # must be the standard KSDATAFORMAT constant
                if clen < 40:
                    raise ValueError("short extensible fmt chunk")
                (fmt_code,) = struct.unpack("<I", body[24:28])
                if body[28:40] != _KS_GUID_TAIL:
                    raise NotImplementedError(
                        "extensible WAV with a non-standard "
                        "SubFormat GUID")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if n_ch is None or n_ch < 1:
        raise ValueError(f"WAV fmt declares {n_ch} channels")
    if fmt_code in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 WAV with bits={bits}")
        expand = alaw_to_linear if fmt_code == 6 else ulaw_to_linear
        usable = len(data) - len(data) % n_ch
        return [sum(expand(data[i + c]) for c in range(n_ch)) // n_ch
                for i in range(0, usable, n_ch)]
    if fmt_code != 1 or bits not in (8, 16, 24):
        raise NotImplementedError(
            f"compressed/non-PCM WAV (format={fmt_code}, "
            f"bits={bits}): codec absent in this environment")
    bw = bits // 8
    frame_bytes = bw * n_ch
    usable = len(data) - len(data) % frame_bytes
    out = []
    for i in range(0, usable, frame_bytes):
        acc = 0
        for c in range(n_ch):
            off = i + c * bw
            if bits == 16:
                acc += struct.unpack("<h", data[off:off + 2])[0]
            elif bits == 8:
                # 8-bit WAV is UNSIGNED (unlike AIFF's signed 8)
                acc += (data[off] - 128) << 8
            else:
                acc += int.from_bytes(
                    data[off:off + 3], "little", signed=True) >> 8
        out.append(acc // n_ch)
    return out


def encode_wav_g711(channel_bytes: list[bytes], rate: int = 8000,
                    law: str = "ulaw") -> bytes:
    """Interleaved G.711 WAV writer (format 6 A-law / 7 mu-law,
    8-bit companded bytes given directly — the fixture domain IS
    the code space, so no linear->companded encoder is needed and
    the decode formula alone is under test)."""
    import struct

    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    n_ch = len(channel_bytes)
    if n_ch < 1 or any(len(c) != len(channel_bytes[0])
                       for c in channel_bytes):
        raise ValueError("need equal-length channels")
    n = len(channel_bytes[0])
    data = bytes(channel_bytes[c][i]
                 for i in range(n) for c in range(n_ch))
    fmt_code = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHH", fmt_code, n_ch, rate, rate * n_ch,
                      n_ch, 8)
    pad = b"\x00" if len(data) & 1 else b""
    return (b"RIFF"
            + struct.pack("<I", 36 + len(data) + len(pad)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data + pad)


#: back-compat alias (the r3 name; the decoder now covers 24-bit too)
decode_wav_pcm16 = decode_wav_pcm


def _pack_extended80(rate: int) -> bytes:
    """Positive int -> IEEE 754 80-bit extended float (the AIFF COMM
    sample-rate field): 1 sign + 15 exponent (bias 16383) + 64
    mantissa with an EXPLICIT integer bit."""
    import struct

    if rate <= 0:
        raise ValueError("rate must be positive")
    nbits = rate.bit_length()
    mant = rate << (64 - nbits)
    exp = 16383 + nbits - 1
    return struct.pack(">HQ", exp, mant)


def _unpack_extended80(raw: bytes) -> int:
    """80-bit extended float -> integer sample rate (floor)."""
    import struct

    exp_s, mant = struct.unpack(">HQ", raw)
    if exp_s & 0x8000:
        raise ValueError("negative AIFF sample rate")
    shift = 16383 + 63 - exp_s
    if shift < 0 or shift > 79 or mant == 0:
        raise ValueError("unreasonable AIFF sample rate")
    return mant >> shift


def encode_aiff_pcm(
    channels: list[list[int]], rate: int = 8000, bits: int = 16,
    ssnd_offset: int = 0,
) -> bytes:
    """Interleaved multi-channel big-endian PCM AIFF writer
    (FORM/AIFF, COMM with the 80-bit extended rate, SSND) — the
    fixture generator for the decode path. ssnd_offset > 0 writes
    that many junk bytes between the SSND header and the frames
    (legal per the spec; the decoder must honor the offset field)."""
    import struct

    if not channels or not channels[0]:
        raise ValueError("no samples")
    if bits not in (8, 16, 24):
        raise ValueError("bits must be 8/16/24")
    n_ch, nfr = len(channels), len(channels[0])
    if any(len(c) != nfr for c in channels):
        raise ValueError("ragged channels")
    bw = bits // 8
    lim = 1 << (bits - 1)
    parts = []
    for i in range(nfr):
        for ch in channels:
            s = max(-lim, min(lim - 1, int(ch[i])))
            parts.append((s & ((1 << bits) - 1)).to_bytes(bw, "big"))
    frames = b"".join(parts)
    comm = (struct.pack(">hIh", n_ch, nfr, bits)
            + _pack_extended80(rate))
    ssnd = (struct.pack(">II", ssnd_offset, 0)
            + b"\xEE" * ssnd_offset + frames)
    body = (b"COMM" + struct.pack(">I", len(comm)) + comm
            + (b"\x00" * (len(comm) & 1))
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return (b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF"
            + body)


def decode_aiff_pcm(payload: bytes) -> list[int]:
    """FORM/AIFF and FORM/AIFC -> int16-scale samples: big-endian
    signed PCM at 8/16/24 bits (8-bit AIFF is SIGNED, unlike WAV's
    unsigned 8-bit; << 8 / verbatim / >> 8 onto the 16-bit scale),
    SSND offset honored, channels floor-mean downmixed —
    decode_wav_pcm's exact contract, so every landmark stage
    downstream is shared. AIFC compression types (r5 third session,
    narrowing the earlier whole-AIFC stub to the genuinely-coded
    ones): 'NONE'/'twos' big-endian PCM, 'sowt' byte-swapped 16-bit
    PCM (the Mac-era little-endian flavor), 'ulaw'/'alaw' G.711
    expansion (one byte per sample regardless of the declared
    sampleSize — Apple writers say 16 there, the stream says
    otherwise); ima4 and the lossy types stay NotImplementedError;
    corrupt containers ValueError."""
    import struct

    if payload[:4] != b"FORM":
        raise ValueError("not a FORM container")
    is_aifc = payload[8:12] == b"AIFC"
    if payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("FORM container is not AIFF")
    pos, n_ch, bits, nfr, frames = 12, None, None, None, None
    ctype = b"NONE"
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack(">I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated AIFF chunk")
        if cid == b"COMM":
            if clen < 18:
                raise ValueError("short COMM chunk")
            n_ch, nfr, bits = struct.unpack(">hIh", body[:8])
            _unpack_extended80(body[8:18])  # validated, unused
            if is_aifc:
                if clen < 22:
                    raise ValueError("AIFC COMM missing "
                                     "compressionType")
                ctype = body[18:22]
        elif cid == b"SSND":
            if clen < 8:
                raise ValueError("short SSND chunk")
            (off,) = struct.unpack(">I", body[:4])
            if 8 + off > clen:
                raise ValueError("SSND offset outside chunk")
            frames = body[8 + off:]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if n_ch is None or frames is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if n_ch < 1:
        raise ValueError(f"AIFF declares {n_ch} channels")
    if ctype in (b"ulaw", b"alaw", b"ULAW", b"ALAW"):
        expand = (ulaw_to_linear if ctype.lower() == b"ulaw"
                  else alaw_to_linear)
        usable = min(len(frames) - len(frames) % n_ch,
                     (nfr or 0) * n_ch)
        return [sum(expand(frames[i + c]) for c in range(n_ch))
                // n_ch for i in range(0, usable, n_ch)]
    if ctype == b"sowt":
        if bits != 16:
            raise ValueError("sowt AIFC must be 16-bit")
        endianness = "little"
    elif ctype in (b"NONE", b"twos"):
        endianness = "big"
    else:
        raise NotImplementedError(
            f"AIFC compression {ctype!r}: codec absent in this "
            "environment")
    if bits not in (8, 16, 24):
        raise NotImplementedError(
            f"{bits}-bit AIFF (8/16/24 supported)")
    bw = bits // 8
    frame_bytes = bw * n_ch
    usable = min(len(frames) - len(frames) % frame_bytes,
                 (nfr or 0) * frame_bytes)
    out = []
    for i in range(0, usable, frame_bytes):
        acc = 0
        for c in range(n_ch):
            off = i + c * bw
            v = int.from_bytes(frames[off:off + bw], endianness,
                               signed=True)
            if bits == 8:
                acc += v << 8
            elif bits == 24:
                acc += v >> 8
            else:
                acc += v
        out.append(acc // n_ch)
    return out


def encode_aifc(channels, rate: int = 8000, ctype: str = "sowt",
                ssnd_offset: int = 0) -> bytes:
    """FORM/AIFC fixture writer: FVER + extended COMM
    (compressionType + pascal-string name) + SSND. ctype 'NONE' /
    'twos' write big-endian 16-bit PCM, 'sowt' little-endian
    16-bit; 'ulaw'/'alaw' take channels of COMPANDED CODE BYTES
    (0..255, one per sample — the fixture domain is the code
    space) with the Apple-convention declared sampleSize 16."""
    import struct

    if ctype not in ("NONE", "twos", "sowt", "ulaw", "alaw"):
        raise ValueError(f"unsupported fixture ctype {ctype}")
    if not channels or not channels[0]:
        raise ValueError("no samples")
    n_ch, nfr = len(channels), len(channels[0])
    if any(len(c) != nfr for c in channels):
        raise ValueError("ragged channels")
    parts = []
    for i in range(nfr):
        for ch in channels:
            v = int(ch[i])
            if ctype in ("ulaw", "alaw"):
                if not 0 <= v <= 255:
                    raise ValueError("companded byte out of range")
                parts.append(bytes([v]))
            else:
                v = max(-32768, min(32767, v))
                parts.append((v & 0xFFFF).to_bytes(
                    2, "little" if ctype == "sowt" else "big"))
    frames = b"".join(parts)
    cname = b"\x00\x00"  # empty pascal string, even-padded
    comm = (struct.pack(">hIh", n_ch, nfr, 16)
            + _pack_extended80(rate)
            + ctype.encode("latin-1") + cname)
    ssnd = (struct.pack(">II", ssnd_offset, 0)
            + b"\xEE" * ssnd_offset + frames)
    body = (b"FVER" + struct.pack(">II", 4, 0xA2805140)
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + (b"\x00" * (len(comm) & 1))
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return (b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFC"
            + body)


def _decode_audio(payload: bytes) -> list[int]:
    """Magic-dispatched real audio decode -> int16-scale samples:
    RIFF/WAVE via decode_wav_pcm, FORM/AIFF via decode_aiff_pcm
    (late r5: the big-endian PCM twin), fLaC via
    functions/flaccodec.py (r5: the first compressed-audio de-stub —
    rice + integer fixed predictors, lossless by construction). Same
    downmix contract on every path."""
    if payload[:4] == b"fLaC":
        from barkingowl_spark.functions.flaccodec import decode_flac

        return decode_flac(payload)
    if payload[:4] == b"FORM":
        return decode_aiff_pcm(payload)
    return decode_wav_pcm(payload)


def _peaks_real(payload: bytes) -> list[tuple[int, int]]:
    """Real constellation over decoded PCM: frame t = samples
    [t*HOP, t*HOP + FRAME); energy e(t, k) = |sum_j s[t*HOP + j] *
    (-1)^popcount(j AND k)| (Walsh-Hadamard sequency k, exact
    integer); peak at (t, k) for k in 1..FRAME-1 iff
    e(t-1, k) < e(t, k) >= e(t+1, k) — the same strict-rise/non-rise
    rule as the stub, applied per band, interior frames only."""
    s = _decode_audio(payload)
    n_frames = (len(s) - FRAME) // HOP + 1 if len(s) >= FRAME else 0
    if n_frames < 3:
        return []
    # per-frame WHT magnitudes via the fast butterfly (exact ints)
    energies = []
    for t in range(n_frames):
        v = s[t * HOP:t * HOP + FRAME]
        h = 1
        while h < FRAME:
            for i in range(0, FRAME, h * 2):
                for j in range(i, i + h):
                    a, b = v[j], v[j + h]
                    v[j], v[j + h] = a + b, a - b
            h *= 2
        energies.append([abs(x) for x in v])
    return [
        (t, k)
        for t in range(1, n_frames - 1)
        for k in range(1, FRAME)
        if energies[t - 1][k] < energies[t][k] >= energies[t + 1][k]
    ]


def _peaks_stub(payload: bytes) -> list[tuple[int, int]]:
    """Deterministic fake constellation: frame t's 'energy' is byte t;
    a peak is a strict rise then non-rise (b[t-1] < b[t] >= b[t+1]).
    Interior frames only — every rule is reproducible in plain SQL."""
    b = list(payload)
    return [
        (t, b[t])
        for t in range(1, len(b) - 1)
        if b[t - 1] < b[t] and b[t] >= b[t + 1]
    ]


def _peaks_dispatch(payload: bytes) -> list[tuple[int, int]]:
    """b'RIFF' / b'FORM' / b'fLaC' magic -> real constellation; else
    the stub. Payloads the real path cannot decode —
    RIFF-but-not-WAVE (AVI), FORM-but-not-AIFF / AIFC,
    float/compressed WAV, truncated chunks (struct.error) — fall
    back to the byte stub, the pre-real-codec behavior, so one
    crawled payload cannot kill the whole mapInPandas job (r3
    advice)."""
    import struct

    if payload[:4] in (b"RIFF", b"FORM", b"fLaC"):
        try:
            return _peaks_real(payload)
        except (ValueError, NotImplementedError, struct.error):
            return _peaks_stub(payload)
    return _peaks_stub(payload)


def wav_table(docs: DataFrame) -> DataFrame:
    """(track_id, payload): a deterministic PCM WAV per doc_id —
    the real-decode fixture (png_table's audio twin): 256 samples
    s[n] = (n * (n + d)) % 8192 - 4096, so a SQL oracle recomputes
    the exact Walsh-Hadamard constellation from the formula while
    Spark round-trips actual RIFF bytes. The ENCODE variant cycles on
    d % 4 — mono 16-bit / STEREO 16-bit (ch0 = s + e, ch1 = s - e
    with e[n] = (n * (d + 3)) % 2048, whose floor-mean downmix is
    exactly s, no parity loss) / mono 24-bit (s << 8, whose >> 8
    rescale is exactly s) / WAVE_FORMAT_EXTENSIBLE 16-bit (r5 third
    session: the 0xFFFE + SubFormat-GUID wrapper every pro writer
    emits; samples stay the formula) — decoded samples are the same
    formula for all four, so one oracle hash pins the 16-bit,
    24-bit, stereo-downmix and extensible-fmt decode paths at once
    (r4 verdict item 7)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
                var = d % 4
                if var == 0:
                    p = encode_wav_pcm([s])
                elif var == 1:
                    e = [(n * (d + 3)) % 2048 for n in range(256)]
                    p = encode_wav_pcm(
                        [[a + b for a, b in zip(s, e)],
                         [a - b for a, b in zip(s, e)]])
                elif var == 2:
                    p = encode_wav_pcm([[v << 8 for v in s]], bits=24)
                else:
                    p = encode_wav_pcm([s], extensible=True)
                payloads.append(p)
            yield pd.DataFrame({"track_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        gen, "track_id long, payload binary")


def g711_table(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a deterministic G.711 WAV per doc_id —
    n = 48 + d % 17 companded bytes b[i] = (11i + 37d) % 256, law
    mu (format 7) on even d / A (format 6) on odd d, mono. The
    fixture domain IS the code space, so the decode expansion alone
    is under test and the SQL oracle recomputes it from the ITU
    closed-form formulas. mapInPandas, Arrow-batched."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                cb = bytes((11 * i + 37 * d) % 256
                           for i in range(48 + d % 17))
                payloads.append(encode_wav_g711(
                    [cb], law="ulaw" if d % 2 == 0 else "alaw"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        gen, "doc_id long, payload binary")


def g711_stats(tracks: DataFrame) -> DataFrame:
    """(doc_id, n_samples, s_sum, s_min, s_max): decode the G.711
    WAV payload column (one mapInPandas pass through
    decode_wav_pcm) and report exact integer aggregates per track —
    the value the SQL oracle recomputes from the expansion formula,
    so one wrong segment shift or bias hash-mismatches. Unparseable
    payloads yield (0, 0, 0, 0) — the containment convention."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    s = decode_wav_pcm(bytes(payload))
                except (ValueError, NotImplementedError):
                    s = []
                if s:
                    rows.append((doc_id, len(s), sum(s), min(s),
                                 max(s)))
                else:
                    rows.append((doc_id, 0, 0, 0, 0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "s_sum",
                               "s_min", "s_max"])

    return tracks.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, n_samples int, s_sum long, s_min long, "
             "s_max long")


def flac_table(docs: DataFrame) -> DataFrame:
    """(track_id, payload): a deterministic FLAC per doc_id — the
    compressed-audio twin of wav_table, SAME sample formula
    s[n] = (n * (n + d)) % 8192 - 4096 (256 samples), so the WAV
    oracle's Walsh-Hadamard SQL applies unchanged. The ENCODE
    variant cycles on d % 9 through the decoder's paths: fixed-2
    mono / mid-side stereo (ch = s +/- e, decorrelated, floor-mean
    mix exactly s) / 24-bit (s << 8, rescaled back) / verbatim /
    escape partitions at order 1 / 5-bit-rice left-side stereo /
    LPC order-3 mono / LPC order-2 mid-side stereo (r5 de-stub:
    quantized integer coefficients, exact recurrence) / 20-bit LPC
    mono (s << 4, late-r5 sample-size de-stub; 12-bit cannot carry
    the 13-bit formula exactly so it is pinned at unit level
    instead) — decoded samples are the formula for all nine, so one
    oracle hash pins rice, fixed AND LPC prediction, stereo
    decorrelation and every exactly-representable bit-depth rescale
    at once (r4 verdict item 3 + r5 LPC)."""
    from barkingowl_spark.functions.flaccodec import encode_flac

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
                e = [(n * (d + 3)) % 2048 for n in range(256)]
                left = [a + b for a, b in zip(s, e)]
                right = [a - b for a, b in zip(s, e)]
                var = d % 9
                if var == 0:
                    p = encode_flac([s])
                elif var == 1:
                    p = encode_flac([left, right],
                                    channel_mode="mid_side")
                elif var == 2:
                    p = encode_flac([[v << 8 for v in s]], bits=24)
                elif var == 3:
                    p = encode_flac([s], subframe="verbatim")
                elif var == 4:
                    p = encode_flac([s], force_escape=True,
                                    partition_order=1)
                elif var == 5:
                    p = encode_flac([left, right], rice5=True,
                                    channel_mode="left_side")
                elif var == 6:
                    p = encode_flac([s], subframe="lpc", order=3)
                elif var == 7:
                    p = encode_flac([left, right], subframe="lpc",
                                    order=2, channel_mode="mid_side")
                else:
                    p = encode_flac([[v << 4 for v in s]], bits=20,
                                    subframe="lpc", order=2)
                payloads.append(p)
            yield pd.DataFrame({"track_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        gen, "track_id long, payload binary")


def aiff_table(docs: DataFrame) -> DataFrame:
    """(track_id, payload): a deterministic AIFF per doc_id — the
    big-endian container twin of wav_table, SAME sample formula
    s[n] = (n * (n + d)) % 8192 - 4096 (256 samples), so the WAV
    oracle's Walsh-Hadamard SQL applies unchanged. The ENCODE
    variant cycles on d % 6 — mono 16-bit / stereo 16-bit (ch = s
    +/- e, floor-mean mix exactly s) / mono 24-bit (s << 8) / mono
    16-bit with a 6-byte SSND offset (junk the decoder must skip) /
    AIFC 'sowt' byte-swapped 16-bit / AIFC 'NONE' (r5 third
    session: the FORM-type + extended-COMM walk and the
    little-endian sample order join the cycle; samples stay the
    formula) — decoded samples are the formula for all six, so one
    oracle hash pins the chunk walk, 80-bit-extended rate parse,
    SSND offset, both sample orders, bit-depth rescale and downmix
    at once. mapInPandas, Arrow-batched."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
                e = [(n * (d + 3)) % 2048 for n in range(256)]
                var = d % 6
                if var == 0:
                    p = encode_aiff_pcm([s])
                elif var == 1:
                    p = encode_aiff_pcm(
                        [[a + b for a, b in zip(s, e)],
                         [a - b for a, b in zip(s, e)]])
                elif var == 2:
                    p = encode_aiff_pcm([[v << 8 for v in s]],
                                        bits=24)
                elif var == 3:
                    p = encode_aiff_pcm([s], ssnd_offset=6)
                elif var == 4:
                    p = encode_aifc([s], ctype="sowt")
                else:
                    p = encode_aifc([s], ctype="NONE")
                payloads.append(p)
            yield pd.DataFrame({"track_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        gen, "track_id long, payload binary")


def extract_peaks(audio: DataFrame, id_col: str = "track_id") -> DataFrame:
    """(id, t, f): the constellation map per payload — one Arrow-batch
    pass, payload bytes never leave the map task."""
    peaks_fn = _peaks_dispatch

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ts, fs = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                for t, f in peaks_fn(bytes(payload)):
                    ids.append(i)
                    ts.append(t)
                    fs.append(f)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "t": pd.Series(ts, dtype="int64"),
                                "f": pd.Series(fs, dtype="int64")})

    return audio.select(id_col, "payload").mapInPandas(
        batches, f"{id_col} long, t long, f long"
    )


def landmark_hashes(
    peaks: DataFrame,
    id_col: str = "track_id",
    fanout: int = 3,
    max_dt: int = 16,
) -> DataFrame:
    """(id, t1, h): each peak paired with its next `fanout` peaks
    within `max_dt` frames (the target zone), hashed
    h = (f1*256 + f2)*64 + dt — Wang §2.2's translation-invariant
    combinatorial hash in one int64. Equi-join on the id + a
    (id, t1)-partitioned rank<=fanout cut (WindowGroupLimit)."""
    if not 1 <= max_dt <= 63:
        raise ValueError("max_dt must be in [1, 63] (6 hash bits)")
    if fanout < 1:
        raise ValueError("fanout must be >= 1")
    a = peaks.select(F.col(id_col), F.col("t").alias("t1"),
                     F.col("f").alias("f1"))
    b = peaks.select(F.col(id_col), F.col("t").alias("t2"),
                     F.col("f").alias("f2"))
    w = Window.partitionBy(id_col, "t1").orderBy("t2")
    return (
        a.join(b, id_col)
        .filter((F.col("t2") > F.col("t1"))
                & (F.col("t2") - F.col("t1") <= max_dt))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= fanout)
        .select(
            id_col, "t1",
            ((F.col("f1") * 256 + F.col("f2")) * 64
             + (F.col("t2") - F.col("t1"))).cast("long").alias("h"),
        )
    )


def match_fingerprints(
    index_lm: DataFrame,
    query_lm: DataFrame,
    min_votes: int = 2,
) -> DataFrame:
    """(query_id, track_id, offset, votes): the Shazam vote histogram —
    hash-join index and query landmarks, bin by the time offset, count.
    Only bins with votes >= min_votes survive (isolated hash collisions
    are noise; time-coherent agreement is signal)."""
    i = index_lm.select(F.col("track_id"), F.col("t1").alias("ti"),
                        "h")
    q = query_lm.select(F.col("query_id"), F.col("t1").alias("tq"),
                        "h")
    return (
        q.join(i, "h")
        .groupBy("query_id", "track_id",
                 (F.col("ti") - F.col("tq")).alias("offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        .filter(F.col("votes") >= min_votes)
    )


def best_matches(histogram: DataFrame) -> DataFrame:
    """(query_id, track_id, offset, votes): each query's winning bin —
    most votes, ties to smallest track then smallest offset; a
    query-partitioned top-1 window (parallel across queries)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("track_id"), F.asc("offset"))
    return (
        histogram.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "track_id", "offset", "votes")
    )
