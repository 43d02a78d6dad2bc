"""Single-file RGBA bitstream container.

The reference never defines an on-disk format (its compress() returns
in-memory strings and the mask codec has no bitstream at all, SURVEY §3.4).
This completes the capability: one self-describing blob holding both
codecs' streams so an RGBA image can be stored and reconstructed
end-to-end.

Layout (little-endian):
  magic  b"RGBA"            4 bytes
  version u8                1, or 2 when the RGB stream is rate-gated
                            (pre-gating decoders reject v2 cleanly
                            instead of silently mis-decoding a stream
                            whose symbol layout they don't understand)
  flags   u8                bit0: mask stream present (0 => opaque alpha)
                            bit1: crop placement present (alpha-bbox mode)
                            bit2: RGB stream is alpha-rate-gated — latent
                            cells with zero /8 recon-alpha pool carry no
                            symbols; the encoder's exact gate bitmap
                            ships as a 5th section (the decoder must NOT
                            re-derive it: a differently-compiled mask
                            decoder could flip an 8-bit-boundary alpha
                            pixel and desync the rANS stream)
  height  u32, width u32    coded image size (pre-/64-padding)
  zh, zw  u16 x2            RGB z-latent spatial shape
  mzh,mzw u16 x2            mask z-latent spatial shape (0 if no mask)
  [crop]  u32 x4            only when flags bit1: canvas_h, canvas_w, y0, x0
                            — the coded (height,width) region sits at
                            (y0,x0) inside a transparent canvas_h x
                            canvas_w canvas (everything outside the
                            alpha bounding box is transparent, so it is
                            never coded at all)
  then 4 length-prefixed (u32) sections:
  rgb_y, rgb_z, mask_y, mask_z (empty when absent)
  [gate]  5th section, only when flags bit2: zlib(packbits(gate)) over
          the (8*zh, 8*zw) alive bitmap, row-major (~100-200 bytes at
          Kodak size — mostly-uniform regions RLE well)

  version 3 (flags bit3): device-decodable lane streams.  Each codec's
  whole bitstream (z + all y slices) is ONE 32-bit lane-interleaved
  rANS stream (entropy/device_rans.py) stored in the y section as
  "u16 lane count || u16 lane word counts || words"; the z sections are
  empty.  Costs ~4 flush bytes/lane over v1/v2 and decodes wholly
  on-device (CodecIO.decompress_device — no per-slice host round trips).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"RGBA"


def pack_rgba(height: int, width: int, rgb: dict, mask: dict | None,
              crop: tuple | None = None) -> bytes:
    """crop, when given, is (canvas_h, canvas_w, y0, x0): the coded
    height x width region is a window into a larger transparent canvas.
    When rgb carries a "gate" bitmap (rate-gated stream, CodecIO
    compress_batch(rate_gate=True)), the container is version 2 and the
    gate ships as a 5th section."""
    gate = rgb.get("gate")
    lanes32 = rgb.get("format") == "lanes32"
    flags = ((1 if mask is not None else 0) | (2 if crop is not None else 0)
             | (4 if gate is not None else 0) | (8 if lanes32 else 0))
    version = 3 if lanes32 else (2 if gate is not None else 1)
    zh, zw = rgb["shape"]
    mzh, mzw = mask["shape"] if mask else (0, 0)
    head = struct.pack("<4sBBIIHHHH", _MAGIC, version, flags, height, width,
                       zh, zw, mzh, mzw)
    if crop is not None:
        head += struct.pack("<IIII", *crop)
    if lanes32:
        # v3: one lane stream per codec (z + all y slices merged for the
        # on-device decode, entropy/device_rans.py); the y section is
        # "u16 lane count || words", the z section is empty
        def lane_sec(c):
            return struct.pack("<H", c["lanes"]) + c["stream"]
        assert mask is None or mask.get("format") == "lanes32", \
            "v3 containers need both codecs in lane format"
        sections = [lane_sec(rgb), b""]
        sections += [lane_sec(mask), b""] if mask else [b"", b""]
    else:
        sections = [rgb["strings"][0], rgb["strings"][1]]
        sections += [mask["strings"][0], mask["strings"][1]] if mask \
            else [b"", b""]
    if gate is not None:
        bits = np.asarray(gate, bool).reshape(zh * 8, zw * 8)
        sections.append(zlib.compress(np.packbits(bits).tobytes()))
    body = b"".join(struct.pack("<I", len(s)) + s for s in sections)
    return head + body


def unpack_rgba(blob: bytes) -> dict:
    """Parse a container blob. The returned dict includes "consumed" —
    the exact byte length of the container — so callers can detect
    trailing data (e.g. the legacy CLI's 8-byte crop trailer)."""
    head_len = struct.calcsize("<4sBBIIHHHH")
    if len(blob) < head_len:
        raise ValueError("not an rgba_tpu container (truncated header)")
    magic, ver, flags, h, w, zh, zw, mzh, mzw = struct.unpack(
        "<4sBBIIHHHH", blob[:head_len])
    if magic != _MAGIC or ver not in (1, 2, 3):
        raise ValueError("not an rgba_tpu container")
    rate_gated = bool(flags & 4)
    lanes32 = bool(flags & 8)
    if ver < 3 and rate_gated != (ver == 2):
        raise ValueError("corrupt rgba_tpu container (gate flag/version)")
    if lanes32 != (ver == 3):
        raise ValueError("corrupt rgba_tpu container (lane flag/version)")
    off = head_len
    crop = None
    if flags & 2:
        if off + 16 > len(blob):
            raise ValueError("truncated rgba_tpu container (crop fields)")
        crop = struct.unpack("<IIII", blob[off:off + 16])
        off += 16
    sections = []
    for _ in range(5 if rate_gated else 4):
        if off + 4 > len(blob):
            raise ValueError("truncated rgba_tpu container (section header)")
        (ln,) = struct.unpack("<I", blob[off:off + 4])
        off += 4
        if off + ln > len(blob):
            raise ValueError("truncated rgba_tpu container (section body)")
        sections.append(blob[off:off + ln])
        off += ln
    def lane_sec(data, shape):
        if len(data) < 2:
            raise ValueError("truncated rgba_tpu container (lane stream)")
        (lanes,) = struct.unpack("<H", data[:2])
        return {"format": "lanes32", "lanes": lanes, "stream": data[2:],
                "shape": shape}

    out = {
        "height": h, "width": w, "consumed": off, "crop": crop,
        "rate_gated": rate_gated, "stream_format":
            "lanes32" if lanes32 else "v64",
        "rgb": lane_sec(sections[0], (zh, zw)) if lanes32 else
               {"strings": [sections[0], sections[1]], "shape": (zh, zw)},
        "mask": None,
    }
    if rate_gated:
        lh, lw = zh * 8, zw * 8
        bits = np.unpackbits(
            np.frombuffer(zlib.decompress(sections[4]), np.uint8))
        if bits.size < lh * lw:
            raise ValueError("corrupt rgba_tpu container (gate bitmap)")
        out["rgb"]["gate"] = bits[:lh * lw].reshape(lh, lw, 1).astype(bool)
    if flags & 1:
        out["mask"] = lane_sec(sections[2], (mzh, mzw)) if lanes32 else \
            {"strings": [sections[2], sections[3]], "shape": (mzh, mzw)}
    return out


class RGBAFileCodec:
    """End-to-end RGBA file encode/decode through both CodecIO streams.

    Encode: compress alpha with the mask codec; reconstruct it (the decoder
    only ever sees the *reconstructed* mask), clean with constraint(); gate
    the RGB codec with it (eval semantics, trainRGB.py:284-289).
    Decode: mask stream first, constraint, then the RGB stream gated by the
    identical reconstructed mask — guaranteeing encoder/decoder agreement.
    """

    def __init__(self, rgb_io, mask_io):
        self.rgb_io = rgb_io
        self.mask_io = mask_io
        self._jits = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            import jax
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def encode(self, image: np.ndarray, alpha: np.ndarray,
               bbox: bool = False, rate_gate: bool = False,
               deadzone: float = 0.0, stream_format: str = "v64") -> bytes:
        """image: (1,H,W,3) float32; alpha: (1,H,W,1) float32."""
        return self.encode_batch(image, alpha, bbox=bbox,
                                 rate_gate=rate_gate, deadzone=deadzone,
                                 stream_format=stream_format)[0]

    def decode(self, blob: bytes, max_slices: int | None = None) -> np.ndarray:
        """Returns (1, H, W, 4) float32 RGBA. max_slices=k decodes a
        progressive preview (see decode_batch)."""
        return self.decode_batch([blob], max_slices=max_slices)

    # ------------------------------------------------- batched serving API

    def encode_batch(self, images: np.ndarray, alphas: np.ndarray,
                     bbox: bool = False, rate_gate: bool = False,
                     deadzone: float = 0.0,
                     bucket: tuple[int, int] | None = None,
                     stream_format: str = "v64") -> list[bytes]:
        """Compress B same-shaped RGBA images in one batched device pass
        per stage (the per-slice autoregression cost is paid once for the
        whole batch). Returns one container blob per image.

        Device-resident pipeline: the image/alpha cross to the device ONCE;
        mask reconstruction, 8-bit re-round, constraint() and RGB gating all
        stay on-chip (the reference ping-pongs these through host numpy,
        AutoEncoderRGB_Journal.py:312-340).  uint8 inputs are accepted and
        converted on-device (8-bit edges — a quarter the transfer bytes).

        bbox=True crops the batch to the union alpha bounding box before
        coding (the reference's zero-window skip taken to its logical end:
        fully-transparent borders are never coded at all — no bits, no
        FLOPs).  The container records the canvas size + offset; decode
        reconstructs the full transparent canvas.  Each distinct crop
        shape compiles its own codec executables (shapes quantize to the
        /64 grid), so keep it off for shape-stable serving fleets unless
        inputs share a canvas layout (sprites, portraits).

        rate_gate=True skips entropy-coding RGB latents in fully-
        transparent regions (container header bit2; decoder re-derives
        the gate).  deadzone>0 widens the RGB quantizer's zero bin —
        runtime rate/quality control from ONE trained model, no header
        flag needed (the stream stays decoder-compatible).

        bucket=(bh, bw) pads to that /64-aligned canvas instead of the
        minimal one (eval/buckets.py shape-bucket ladder: mixed-size
        directories compile O(#buckets) executables instead of one set
        per distinct shape).  Format-free: the header keeps the original
        (h, w) and decode derives the canvas from the z-latent shape, so
        bucketed and minimal blobs are the same container version."""
        import jax.numpy as jnp
        from ..ops.morphology import constraint_rgb

        b, h, w = images.shape[:3]
        crop = None
        if bbox:
            vis_y = np.any(alphas > 0, axis=(0, 2, 3))
            vis_x = np.any(alphas > 0, axis=(0, 1, 3))
            if vis_y.any() and not (vis_y.all() and vis_x.all()):
                y0, y1 = np.flatnonzero(vis_y)[[0, -1]]
                x0, x1 = np.flatnonzero(vis_x)[[0, -1]]
                if (y1 - y0 + 1, x1 - x0 + 1) != (h, w):
                    crop = (h, w, int(y0), int(x0))
                    images = images[:, y0:y1 + 1, x0:x1 + 1]
                    alphas = alphas[:, y0:y1 + 1, x0:x1 + 1]
                    h, w = images.shape[1:3]
        one = 255 if alphas.dtype == np.uint8 else 1.0
        # opacity is judged on the ORIGINAL alpha; for padded sizes the
        # decoder rebuilds the ones-inside/zeros-outside pattern from the
        # header dims, so fully-opaque images still ship no mask stream
        opaque = [bool(np.all(alphas[i] == one)) for i in range(b)]
        non_op = [i for i in range(b) if not opaque[i]]

        # arbitrary resolutions: transparent-pad to the model's /64 grid
        # (the reference hard-requires divisible-by-64 inputs; SURVEY §7.3
        # calls for explicit pad/crop).  alpha pads with 0 = transparent,
        # which the masked codecs handle natively; decode crops back.
        hp, wp = -(-h // 64) * 64, -(-w // 64) * 64
        if bucket is not None:
            bh, bw = int(bucket[0]), int(bucket[1])
            if bh < hp or bw < wp or bh % 64 or bw % 64:
                raise ValueError(
                    f"bucket {bucket} must be /64-aligned and cover the "
                    f"minimal padded canvas {(hp, wp)}")
            hp, wp = bh, bw
        if (hp, wp) != (h, w):
            pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
            images = np.pad(images, pad)
            alphas = np.pad(alphas, pad)

        to_float = self._jit("to_float", lambda v: (
            v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8
            else v))
        x_dev = to_float(jnp.asarray(images))
        a_dev = to_float(jnp.asarray(alphas))

        def base_mask():
            m = jnp.zeros((b, hp, wp, 1), jnp.float32)
            return m.at[:, :h, :w].set(1.0)

        mask_comps: dict[int, dict] = {}
        if non_op:
            comps = self.mask_io.compress_batch(
                mask=a_dev[jnp.asarray(non_op)], stream_format=stream_format)
            if stream_format == "lanes32":
                rm_sub = self.mask_io.decompress_device(comps)
            else:
                rm_sub = self.mask_io.decompress_batch(comps, device=True)
            mask_comps = dict(zip(non_op, comps))

            def scatter_post(x, rm_s):
                rm_s = jnp.round(jnp.clip(rm_s, 0, 1) * 255.0) / 255.0
                rm_s = constraint_rgb(rm_s)
                rm = base_mask()
                rm = rm.at[jnp.asarray(non_op)].set(rm_s)
                return rm, jnp.where(rm > 0, x, rm)

            recon_mask, masked = self._jit(
                f"enc_post{(h, w, hp, wp) + tuple(non_op)}",
                scatter_post)(x_dev, rm_sub)
        else:
            recon_mask = self._jit(f"enc_base{(b, h, w, hp, wp)}",
                                   base_mask)()
            masked = self._jit("mask_apply", lambda x, m: jnp.where(
                m > 0, x, m))(x_dev, recon_mask)
        rgb_comps = self.rgb_io.compress_batch(image=masked, mask=recon_mask,
                                               rate_gate=rate_gate,
                                               deadzone=deadzone,
                                               stream_format=stream_format)
        return [pack_rgba(h, w, rgb_comps[i], mask_comps.get(i), crop)
                for i in range(b)]

    def decode_batch(self, blobs: list[bytes],
                     output: str = "float32",
                     max_slices: int | None = None,
                     interleave: int | None = None) -> np.ndarray:
        """Decode B same-shaped container blobs; returns (B, H, W, 4).

        The two codecs' slice chains are driven TOGETHER (drive_chains):
        the mask codec's 5-slice chain is independent of the RGB codec's
        10-slice chain until the final image decode (the gate ships in the
        blob; only the synthesis transform needs the reconstructed mask),
        so the mask chain's host rANS + index fetches hide under the RGB
        chain's device dispatches and vice versa.  Bit-identical to serial
        driving — interleaving only reorders when independent programs are
        enqueued on the single device stream.  interleave=G>1 additionally
        splits the RGB batch into G sub-chains (see
        CodecIO.decompress_batch; each sub-batch size compiles its own
        slice executables once per process); None auto-picks G=2 for
        even batches 4-8, G=1 elsewhere (round-4 measured ladder,
        narrowed per ADVICE r4).

        output="uint8" fetches the 8-bit quantized RGBA (the PNG-writing
        contract of the reference eval, trainRGB.py:300-311) — a quarter
        the bytes of the float fetch; "float32" keeps the exact clipped
        reconstruction for metric parity.

        max_slices=k (progressive preview) decodes only the first k of
        the RGB codec's 10 latent slices and mean-fills the rest — lower
        latency from the SAME blob, graceful quality degradation (see
        CodecIO.decompress_batch).  The alpha stream is always decoded
        in full: it is tiny, and the RGB gating must see the exact
        reconstructed mask the encoder used."""
        import jax.numpy as jnp

        from ..ops.morphology import constraint_rgb
        from .codec_io import drive_chains

        metas = [unpack_rgba(blob) for blob in blobs]
        h, w = metas[0]["height"], metas[0]["width"]
        assert all(m["height"] == h and m["width"] == w for m in metas), \
            "decode_batch requires same-sized images"
        crop = metas[0]["crop"]
        assert all(m["crop"] == crop for m in metas), \
            "decode_batch requires identical crop placements"
        rate_gated = metas[0]["rate_gated"]
        assert all(m["rate_gated"] == rate_gated for m in metas), \
            "decode_batch requires identical rate-gate flags"
        b = len(metas)
        # the RGB z-latent sits at /64 of the (padded) coding size; header
        # h, w are the original dims to crop back to
        zh, zw = metas[0]["rgb"]["shape"]
        hp, wp = zh * 64, zw * 64

        def base_mask():
            m = jnp.zeros((b, hp, wp, 1), jnp.float32)
            return m.at[:, :h, :w].set(1.0)

        sf = metas[0]["stream_format"]
        assert all(m["stream_format"] == sf for m in metas), \
            "decode_batch requires one stream format per batch"
        if sf == "lanes32":
            # v3 lane streams: both codecs decode wholly on-device (one
            # dispatch each, decompress_device) — no index round trips
            with_mask = [i for i, m in enumerate(metas)
                         if m["mask"] is not None]
            if with_mask:
                rm_sub = self.mask_io.decompress_device(
                    [metas[i]["mask"] for i in with_mask])

                def scatter_mask(rm_s):
                    rm_s = jnp.round(jnp.clip(rm_s, 0, 1) * 255.0) / 255.0
                    rm_s = constraint_rgb(rm_s)
                    return base_mask().at[jnp.asarray(with_mask)].set(rm_s)

                recon_mask = self._jit(
                    f"dec_mask{(b, h, w, hp, wp) + tuple(with_mask)}",
                    scatter_mask)(rm_sub)
            else:
                recon_mask = self._jit(f"dec_base{(b, h, w, hp, wp)}",
                                       base_mask)()
            rgb = self.rgb_io.decompress_device(
                [m["rgb"] for m in metas], mask=recon_mask,
                max_slices=max_slices)
            return self._finish(rgb, recon_mask, b, h, w, crop, output)

        # rate-gated blobs always carry the encoder's exact gate bitmap
        # (container section 5) — never re-derive it from the decoded mask
        gate_host = np.stack([m["rgb"]["gate"] for m in metas]) \
            if rate_gated else None
        rgb_chains = self.rgb_io.decompress_chains(
            [m["rgb"] for m in metas], gate_host=gate_host,
            max_slices=max_slices, interleave=interleave)
        n_rgb = len(rgb_chains)

        with_mask = [i for i, m in enumerate(metas) if m["mask"] is not None]
        chains = rgb_chains + (
            [self.mask_io.decompress_chain(
                [metas[i]["mask"] for i in with_mask])] if with_mask else [])
        outs = drive_chains(chains)
        y_rgb = outs[0] if n_rgb == 1 else jnp.concatenate(outs[:n_rgb], 0)

        if with_mask:
            rm_sub = self.mask_io.decode_image(outs[n_rgb], device=True)

            def scatter_mask(rm_s):
                rm_s = jnp.round(jnp.clip(rm_s, 0, 1) * 255.0) / 255.0
                rm_s = constraint_rgb(rm_s)
                return base_mask().at[jnp.asarray(with_mask)].set(rm_s)

            recon_mask = self._jit(
                f"dec_mask{(b, h, w, hp, wp) + tuple(with_mask)}",
                scatter_mask)(rm_sub)
        else:
            recon_mask = self._jit(f"dec_base{(b, h, w, hp, wp)}",
                                   base_mask)()
        rgb = self.rgb_io.decode_image(y_rgb, mask=recon_mask, device=True)
        return self._finish(rgb, recon_mask, b, h, w, crop, output)

    def _finish(self, rgb, recon_mask, b, h, w, crop, output):
        """Shared decode tail: fetch the (cropped) RGBA in the requested
        dtype and place it back on its canvas when bbox-coded."""
        import jax.numpy as jnp

        if output == "uint8":
            pack = self._jit(f"pack_u8{(h, w)}", lambda x, m: jnp.round(
                jnp.concatenate([x[:, :h, :w], m[:, :h, :w]], -1)
                * 255.0).astype(jnp.uint8))
            out = np.asarray(pack(rgb, recon_mask))
        else:
            cat = self._jit(f"pack_f32{(h, w)}", lambda x, m: jnp.concatenate(
                [x[:, :h, :w], m[:, :h, :w]], -1))
            out = np.asarray(cat(rgb, recon_mask))
        if crop is not None:
            ch, cw, y0, x0 = crop
            canvas = np.zeros((b, ch, cw, 4), out.dtype)
            canvas[:, y0:y0 + h, x0:x0 + w] = out
            return canvas
        return out
