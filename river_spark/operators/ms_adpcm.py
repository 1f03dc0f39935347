"""Microsoft ADPCM in a WAV container (format tag 0x0002), pure numpy.

Completes the classic RIFF compressed-audio pair next to IMA/DVI ADPCM
(operators/adpcm.py): MS-ADPCM is the OTHER 4-bit adaptive coder legacy
game/voice corpora ship. Blocks carry per-channel headers — a
predictor-coefficient index into the 7 standard (iCoef1, iCoef2) pairs,
an initial idelta, and the two seed samples — followed by a nibble
stream (high nibble first; stereo alternates channels per nibble). The
per-sample recurrence is the public spec's fixed-point form:

    pred   = (sample1*coef1 + sample2*coef2) >> 8   (arithmetic shift)
    out    = clamp16(pred + signed_nibble * idelta)
    idelta = max(16, (ADAPTATION[nibble] * idelta) >> 8)

MS-ADPCM is lossy and SEQUENTIAL (like IMA), so correctness is pinned
by (a) encoder/decoder LOCKSTEP — the encoder tracks the decoder's
reconstruction exactly and tests assert decode(encode(x)) equals the
encoder's tracked reconstruction bit-for-bit — and (b) an independent
scalar reference decoder in the tests. The fmt chunk carries the full
extensible ADPCM header (wSamplesPerBlock, wNumCoef=7, the coefficient
table) as real encoders write it, and the decoder validates it.

Reference scope parity: the reference engine stores opaque binary
payloads (stream transport only); decode here is a first-class
distributed operator per SURVEY.md's multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_ms_adpcm_wav", "decode_ms_adpcm_wav",
           "MS_COEFS", "MS_ADAPTATION"]

# the 7 standard predictor coefficient pairs (public MS spec)
MS_COEFS = np.array(
    [(256, 0), (512, -256), (0, 0), (192, 64),
     (240, 0), (460, -208), (392, -232)],
    dtype=np.int64,
)
MS_ADAPTATION = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int64,
)


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _step(nibble_u: int, s1: int, s2: int, idelta: int, c1: int, c2: int):
    """One spec step: returns (new sample, new idelta). ``nibble_u`` is
    the raw unsigned nibble; its signed value is nibble_u - 16 when the
    sign bit is set."""
    signed = nibble_u - 16 if nibble_u & 8 else nibble_u
    pred = (s1 * c1 + s2 * c2) >> 8
    out = _clamp16(pred + signed * idelta)
    idelta = (int(MS_ADAPTATION[nibble_u]) * idelta) >> 8
    if idelta < 16:
        idelta = 16
    return out, idelta


def encode_ms_adpcm_wav(
    sample_rate: int,
    n_channels: int,
    samples: "np.ndarray",
    samples_per_block: int = 128,
    predictor: int | None = None,
) -> bytes:
    """Encode interleaved int16 samples as MS-ADPCM WAV.

    ``samples_per_block`` counts samples PER CHANNEL per block (>= 2).
    ``predictor`` pins one coefficient pair for every block; None picks
    the best of the 7 per block by squared reconstruction error (what
    real encoders approximate). Total samples must fill whole blocks.
    """
    if n_channels not in (1, 2):
        raise ValueError("1 or 2 channels")
    if samples_per_block < 2:
        raise ValueError("samples_per_block must be >= 2")
    s = np.asarray(samples, dtype=np.int64)
    if s.size % (n_channels * samples_per_block):
        raise ValueError("samples must fill whole blocks")
    frames = s.reshape(-1, n_channels)  # (n_frames, nch)
    n_blocks = frames.shape[0] // samples_per_block
    block_align = n_channels * 7 + ((samples_per_block - 2) * n_channels + 1) // 2

    def encode_block(blk) -> bytes:
        # blk: (samples_per_block, nch)
        best = None
        preds = range(7) if predictor is None else [predictor]
        for pi in preds:
            c1, c2 = int(MS_COEFS[pi][0]), int(MS_COEFS[pi][1])
            chans = []
            err = 0
            for ch in range(n_channels):
                col = blk[:, ch]
                s2, s1 = int(col[0]), int(col[1])
                idelta = max(16, int(np.abs(np.diff(col)).mean()) if
                             col.size > 1 else 16)
                nibbles = []
                recon = [s2, s1]
                for k in range(2, col.size):
                    target = int(col[k])
                    pred = (s1 * c1 + s2 * c2) >> 8
                    diff = target - pred
                    n_signed = diff // idelta if idelta else 0
                    n_signed = max(-8, min(7, n_signed))
                    n_u = n_signed & 0x0F
                    out, idelta_new = _step(n_u, s1, s2, idelta, c1, c2)
                    nibbles.append(n_u)
                    recon.append(out)
                    err += (out - target) ** 2
                    s2, s1 = s1, out
                    idelta = idelta_new
                chans.append((int(blk[0, ch]), int(blk[1, ch]),
                              nibbles, recon))
            if best is None or err < best[0]:
                best = (err, pi, chans)
        _, pi, chans = best
        c1, c2 = int(MS_COEFS[pi][0]), int(MS_COEFS[pi][1])
        # headers: predictors, ideltas, sample1s, sample2s (per channel)
        out = bytearray(bytes([pi] * n_channels))
        for ch in range(n_channels):
            col = blk[:, ch]
            idelta0 = max(16, int(np.abs(np.diff(col)).mean()) if
                          col.size > 1 else 16)
            out += struct.pack("<h", min(32767, idelta0))
        for ch in range(n_channels):
            out += struct.pack("<h", chans[ch][1])  # sample1 (more recent)
        for ch in range(n_channels):
            out += struct.pack("<h", chans[ch][0])  # sample2
        # nibble stream: frame-interleaved, high nibble first
        flat = []
        n_nib = len(chans[0][2])
        for k in range(n_nib):
            for ch in range(n_channels):
                flat.append(chans[ch][2][k])
        if len(flat) & 1:
            flat.append(0)
        for i in range(0, len(flat), 2):
            out.append((flat[i] << 4) | flat[i + 1])
        return bytes(out)

    body = bytearray()
    for b in range(n_blocks):
        body += encode_block(frames[b * samples_per_block:
                                    (b + 1) * samples_per_block])

    coef_tail = b"".join(struct.pack("<hh", int(a), int(bb))
                         for a, bb in MS_COEFS)
    fmt = struct.pack(
        "<HHIIHHHHH", 2, n_channels, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        32, samples_per_block, 7,
    ) + coef_tail
    fact = struct.pack("<I", frames.shape[0])
    pad = b"\x00" if len(body) & 1 else b""
    riff = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", 4) + fact
            + b"data" + struct.pack("<I", len(body)) + bytes(body) + pad)
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WAVE" + riff


def decode_ms_adpcm_wav(payload: bytes):
    """Decode an MS-ADPCM WAV. Returns (sample_rate, n_channels,
    int16 interleaved samples). Raises ValueError on framing, header,
    or coefficient-table defects."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + csize]
        if len(body) != csize:
            raise ValueError("truncated chunk body")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None or len(fmt) < 18:
        raise ValueError("missing fmt/data chunk")
    tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    bits = struct.unpack_from("<H", fmt, 14)[0]
    cb = struct.unpack_from("<H", fmt, 16)[0]
    if tag != 2:
        raise ValueError(f"not MS-ADPCM (format tag {tag})")
    if bits != 4:
        raise ValueError("MS-ADPCM is 4-bit")
    if nch not in (1, 2):
        raise ValueError("1 or 2 channels")
    if cb < 32 or len(fmt) < 18 + 32:
        raise ValueError("truncated ADPCM fmt extension")
    spb, ncoef = struct.unpack_from("<HH", fmt, 18)
    if spb < 2:
        raise ValueError("samples per block must be >= 2")
    if ncoef < 7:
        raise ValueError("coefficient table must carry the 7 standard pairs")
    coefs = [struct.unpack_from("<hh", fmt, 22 + 4 * i) for i in range(ncoef)]
    expected_align = nch * 7 + ((spb - 2) * nch + 1) // 2
    if block_align != expected_align:
        raise ValueError("block align inconsistent with samples per block")
    if len(data) % block_align:
        raise ValueError("data chunk not a whole number of blocks")

    out = []
    for b0 in range(0, len(data), block_align):
        blk = data[b0: b0 + block_align]
        preds = list(blk[:nch])
        if any(p >= ncoef for p in preds):
            raise ValueError("predictor index outside the coefficient table")
        o = nch
        idelta = list(struct.unpack_from("<" + "h" * nch, blk, o))
        o += 2 * nch
        s1 = list(struct.unpack_from("<" + "h" * nch, blk, o))
        o += 2 * nch
        s2 = list(struct.unpack_from("<" + "h" * nch, blk, o))
        o += 2 * nch
        chans = [[s2[ch], s1[ch]] for ch in range(nch)]
        c = [coefs[preds[ch]] for ch in range(nch)]
        n_nib = (spb - 2) * nch
        nibbles = []
        for i in range((n_nib + 1) // 2):
            byte = blk[o + i]
            nibbles.append(byte >> 4)
            nibbles.append(byte & 0x0F)
        for k in range(n_nib):
            ch = k % nch
            n_u = nibbles[k]
            outv, idelta[ch] = _step(
                n_u, chans[ch][-1], chans[ch][-2], idelta[ch],
                int(c[ch][0]), int(c[ch][1]))
            chans[ch].append(outv)
        frames = np.empty((spb, nch), dtype=np.int16)
        for ch in range(nch):
            frames[:, ch] = chans[ch]
        out.append(frames)
    samples = np.concatenate(out, axis=0).reshape(-1)
    return rate, nch, samples
