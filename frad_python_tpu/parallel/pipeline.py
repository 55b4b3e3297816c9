"""Whole-file batch codec pipeline.

The streaming engines (encoder.py/decoder.py) process one frame per call;
this module is the TPU-first fast path: it plans every frame of a stream
up front, runs the tensor domain as ONE batched jitted core call
([B, N, C] through models/batch.py), and finishes the byte domain
(EGR/DEFLATE/RS/ASFH) on the host — optionally threaded, since the
native codecs and zlib release the GIL.

Output is byte-exact with the streaming Encoder fed by process()+flush()
(tested in tests/test_parallel.py): same frame boundaries, same overlap
fragments, same force-flush terminators.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..container import ecc as ecc_mod
from ..container.asfh import ASFH
from ..decoder import Decoder
from ..models import COMPACT, batch, profile0, profile1, profile4
from ..models.profiles import compact
from ..ops import packing

DEFAULT_ECC_RATIO = (96, 24)


def plan_frames(total: int, fsize: int, overlap_ratio: int, is_compact: bool
                ) -> tuple[list[tuple[int, int]], int]:
    """Replicates the streaming engine's read plan (encoder.py:72-90).

    Returns ([(start, length), ...], n_terminators). Frame i covers
    samples [start, start+length); overlapping regions are re-read,
    mirroring the fragment carry. n_terminators is how many force-flush
    headers a process()+flush() sequence would emit (compact only).
    """
    n = compact.get_samples_min_ge(fsize) if is_compact else fsize
    olap_active = is_compact and overlap_ratio > 1

    frames: list[tuple[int, int]] = []
    pos = 0
    frag = 0
    while True:
        new = n - frag
        if pos + new > total:
            break
        frames.append((pos - frag, n))
        frag = (n - n * (overlap_ratio - 1) // overlap_ratio) if olap_active else 0
        pos += new

    remaining = total - pos
    has_tail = remaining > 0 or frag > 0
    if has_tail:
        frames.append((pos - frag, frag + remaining))

    if not is_compact:
        terms = 0
    else:
        terms = 2 if has_tail else 1
    return frames, terms


def _asfh_for(profile: int, bit_depth_index: int, channels: int, srate: int,
              fsize: int, *, ecc: bool, ecc_ratio: tuple[int, int],
              little_endian: bool, overlap_ratio: int) -> ASFH:
    a = ASFH()
    a.profile = profile
    a.bit_depth_index = bit_depth_index
    a.channels = channels
    a.srate = srate
    a.fsize = fsize
    a.ecc = ecc
    a.ecc_dsize, a.ecc_codesize = ecc_ratio if ecc else (0, 0)
    a.endian = little_endian
    a.overlap_ratio = overlap_ratio
    return a


def batch_encode(pcm: np.ndarray, profile: int, srate: int, bit_depth: int,
                 frame_size: int, *, loss_level: float = 0.5,
                 enable_ecc: bool = False,
                 ecc_ratio: tuple[int, int] = DEFAULT_ECC_RATIO,
                 little_endian: bool = False, overlap_ratio: int = 16,
                 workers: int = 4) -> bytes:
    """Encode a whole [T, C] f64 PCM array into a FrAD byte stream.

    Byte-exact with streaming `Encoder(...).process(raw) + flush()`.
    """
    pcm = np.asarray(pcm, dtype=np.float64)
    total, channels = pcm.shape
    is_compact = profile in COMPACT
    if is_compact:
        srate = compact.get_valid_srate(srate)
        loss_level = max(abs(loss_level), 0.125)
        overlap_ratio = overlap_ratio if overlap_ratio == 0 else max(2, min(256, overlap_ratio))
    else:
        overlap_ratio = 0

    frames, terms = plan_frames(total, frame_size, overlap_ratio, is_compact)
    if not frames:
        a = _asfh_for(profile, 0, max(channels, 1), srate,
                      compact.get_samples_min_ge(frame_size) if is_compact else frame_size,
                      ecc=enable_ecc, ecc_ratio=ecc_ratio,
                      little_endian=little_endian, overlap_ratio=overlap_ratio)
        return a.force_flush() * max(terms, 1) if is_compact else b""

    n = frames[0][1]
    uniform = [f for f in frames if f[1] == n]
    tail = frames[len(uniform):]            # 0 or 1 non-uniform tail frame

    # ---- tensor domain: one batched core call over the uniform frames ----
    payload_parts: list[tuple[bytes, int, int]] = []  # (payload, bdi, flen)

    def _gather(frs: list[tuple[int, int]], length: int) -> np.ndarray:
        out = np.zeros((len(frs), length, channels), dtype=np.float64)
        for i, (s, ln) in enumerate(frs):
            s0 = max(s, 0)
            out[i, s0 - s: ln] = pcm[s0: s + ln]
        return out

    def _encode_frames(frs: list[tuple[int, int]]) -> list[tuple[bytes, int, int]]:
        if not frs:
            return []
        flen = frs[0][1]
        arr = _gather(frs, flen)
        if profile == 1:
            arr_p, srate_v, ll = profile1.prepare_frame(arr[0], srate, loss_level)
            dlen = arr_p.shape[0]
            if dlen != flen:
                pad = np.zeros((len(frs), dlen, channels))
                pad[:, :flen] = arr
                arr = pad
            factor = profile1._scale_factor(bit_depth if bit_depth in profile1.DEPTHS else 16)
            bits = bit_depth if bit_depth in profile1.DEPTHS else 16
            fq, tq = batch.p1_encode_core(arr, srate_v, ll, factor)
            fq = np.asarray(fq)
            tq = np.asarray(tq)
            bdi = profile1.DEPTHS.index(bits)

            def pack_one(i: int) -> tuple[bytes, int, int]:
                return (profile1.pack_streams(fq[i].ravel(), tq[i].ravel()),
                        bdi, frs[i][1])

            with ThreadPoolExecutor(max_workers=workers) as ex:
                return list(ex.map(pack_one, range(len(frs))))

        # lossless profiles
        if profile == 0:
            coeffs = np.asarray(batch.p0_encode_core(arr))
        else:  # profile 4
            coeffs = arr
        maxabs = np.max(np.abs(coeffs.reshape(len(frs), -1)), axis=1) if coeffs.size else np.zeros(len(frs))

        def pack_one(i: int) -> tuple[bytes, int, int]:
            bits = bit_depth if bit_depth in packing.DEPTHS else 16
            bits = packing.needed_depth(float(maxabs[i]), bits)
            payload = packing.pack_floats(coeffs[i].ravel(), bits, little_endian)
            return payload, packing.DEPTHS.index(bits), frs[i][1]

        with ThreadPoolExecutor(max_workers=workers) as ex:
            return list(ex.map(pack_one, range(len(frs))))

    payload_parts.extend(_encode_frames(uniform))
    payload_parts.extend(_encode_frames(tail))

    # ---- byte domain: ECC + framing (order-preserving) ----
    def frame_bytes(part: tuple[bytes, int, int]) -> bytes:
        payload, bdi, flen = part
        if enable_ecc:
            payload = ecc_mod.encode(payload, *ecc_ratio)
        a = _asfh_for(profile, bdi, channels, srate, flen,
                      ecc=enable_ecc, ecc_ratio=ecc_ratio,
                      little_endian=little_endian, overlap_ratio=overlap_ratio)
        return a.write(payload)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        framed = list(ex.map(frame_bytes, payload_parts))

    if is_compact and terms:
        a = _asfh_for(profile, payload_parts[-1][1], channels, srate,
                      payload_parts[-1][2], ecc=enable_ecc, ecc_ratio=ecc_ratio,
                      little_endian=little_endian, overlap_ratio=overlap_ratio)
        framed.append(a.force_flush() * terms)
    return b"".join(framed)


def batch_decode(stream: bytes, *, fix_error: bool = False,
                 workers: int = 4) -> tuple[np.ndarray, int]:
    """Decode a FrAD byte stream in batched mode.

    Fast path: a uniform prefix run (same profile/depth/channels/srate/
    fsize, full-length frames) is decoded as one batched core call with a
    vectorised overlap-add; everything after (tail frames, terminators,
    format changes) goes through the streaming Decoder seeded with the
    carried overlap state. Returns (pcm [T, C], srate).
    """
    # ---- host parse: split stream into frames ----
    headers: list[ASFH] = []
    payloads: list[bytes] = []
    pos = 0
    buf = stream
    tail_bytes = b""
    while True:
        a = ASFH()
        idx = buf.find(b"\xff\xd0\xd2\x98", pos)
        if idx < 0:
            break
        status, rest = a.read(buf[idx:])
        if status != "Complete":
            tail_bytes = buf[idx:]
            break
        if len(rest) < a.frmbytes:
            tail_bytes = buf[idx:]
            break
        headers.append(a)
        payloads.append(rest[: a.frmbytes])
        consumed = (idx + a.header_bytes + a.frmbytes)
        buf = buf[consumed:]
        pos = 0
    if not headers:
        dec = Decoder(fix_error=fix_error)
        out = dec.process(stream).pcm
        tail = dec.flush().pcm
        parts = [p for p in (out, tail) if p.size]
        return (np.concatenate(parts) if parts else np.empty((0,))), dec.asfh.srate

    # ---- find the uniform batched prefix ----
    h0 = headers[0]
    key0 = (h0.profile, h0.bit_depth_index, h0.channels, h0.srate, h0.fsize,
            h0.ecc, h0.overlap_ratio)
    run = 0
    for h in headers:
        if ((h.profile, h.bit_depth_index, h.channels, h.srate, h.fsize,
             h.ecc, h.overlap_ratio) != key0):
            break
        run += 1
    # keep the final run frame for the streaming tail path so its fragment
    # threading stays exact
    run = max(run - 1, 0)

    out_parts: list[np.ndarray] = []
    srate = h0.srate
    frag = np.empty((0, 0), dtype=np.float64)

    if run >= 1:
        hs = headers[:run]
        ps = payloads[:run]
        if h0.ecc:
            def de_ecc(i: int) -> bytes:
                repair = fix_error and not hs[i].payload_crc_matches(ps[i])
                return ecc_mod.decode(ps[i], hs[i].ecc_dsize, hs[i].ecc_codesize, repair)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                ps = list(ex.map(de_ecc, range(run)))

        ch = h0.channels
        n = h0.fsize
        prof = h0.profile

        if prof == 1:
            factor = profile1._scale_factor(profile1.DEPTHS[h0.bit_depth_index])

            def unpack_one(i: int):
                s = profile1.unpack_streams(ps[i])
                if s is None:
                    return (np.zeros(n * ch), np.zeros(27 * ch))
                fi, ti = s
                fi = profile1._untrim(fi.astype(np.float64), n, ch)[: n * ch]
                ti = profile1._untrim(ti.astype(np.float64), 27, ch)[: 27 * ch]
                return fi, ti

            with ThreadPoolExecutor(max_workers=workers) as ex:
                unpacked = list(ex.map(unpack_one, range(run)))
            fq = np.stack([u[0].reshape(n, ch) for u in unpacked])
            tq = np.stack([u[1].reshape(27, ch) for u in unpacked])
            frames = np.asarray(batch.p1_decode_core(fq, tq, h0.srate, factor))
        elif prof in (0, 4):
            def unpack_one(i: int):
                flat = packing.unpack_floats(ps[i], packing.DEPTHS[h0.bit_depth_index], h0.endian)
                m = (len(flat) // ch) * ch
                arr = flat[:m].reshape(-1, ch)
                if len(arr) < n:
                    arr = np.pad(arr, ((0, n - len(arr)), (0, 0)))
                return arr[:n]

            with ThreadPoolExecutor(max_workers=workers) as ex:
                coeffs = np.stack(list(ex.map(unpack_one, range(run))))
            frames = np.asarray(batch.p0_decode_core(coeffs)) if prof == 0 else coeffs
        else:
            frames = None  # profile 2: no batch core yet, stream it all
            run = 0

        if run >= 1 and frames is not None:
            if prof in COMPACT and h0.overlap_ratio > 1:
                cut = n * (h0.overlap_ratio - 1) // h0.overlap_ratio
                olap = n - cut
                out_parts.append(
                    np.asarray(batch.overlap_add_core(frames, olap, cut)).reshape(-1, ch))
                frag = frames[-1, cut:, :]
            else:
                out_parts.append(frames.reshape(-1, ch))
                frag = np.empty((0, 0), dtype=np.float64)

    # ---- stream the rest with carried state ----
    dec = Decoder(fix_error=fix_error)
    dec.overlap_fragment = np.asarray(frag, dtype=np.float64)
    dec.info = (h0.channels, h0.srate)
    rest_stream = b"".join(
        _reframe(headers[i], payloads[i]) for i in range(run, len(headers))
    ) + tail_bytes
    if rest_stream:
        r = dec.process(rest_stream)
        out_parts.append(r.pcm)
        srate = r.srate or srate
        out_parts.append(dec.flush().pcm)
    else:
        out_parts.append(np.asarray(frag))

    parts = [np.atleast_2d(p) for p in out_parts if p.size]
    if not parts:
        return np.empty((0, h0.channels)), srate
    return np.concatenate(parts, axis=0), srate


def _reframe(a: ASFH, payload: bytes) -> bytes:
    """Reserialise an already-parsed frame (header buffer is authoritative)."""
    return a.buffer + payload
