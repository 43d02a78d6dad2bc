"""Single-file RGBA bitstream container.

The reference never defines an on-disk format (its compress() returns
in-memory strings and the mask codec has no bitstream at all, SURVEY §3.4).
This completes the capability: one self-describing blob holding both
codecs' streams so an RGBA image can be stored and reconstructed
end-to-end.

Layout (little-endian):
  magic  b"RGBA"            4 bytes
  version u8                = 1
  flags   u8                bit0: mask stream present (0 => opaque alpha)
  height  u32, width u32    original image size
  zh, zw  u16 x2            RGB z-latent spatial shape
  mzh,mzw u16 x2            mask z-latent spatial shape (0 if no mask)
  then 4 length-prefixed (u32) sections:
  rgb_y, rgb_z, mask_y, mask_z (empty when absent)
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"RGBA"


def pack_rgba(height: int, width: int, rgb: dict, mask: dict | None) -> bytes:
    flags = 1 if mask is not None else 0
    zh, zw = rgb["shape"]
    mzh, mzw = mask["shape"] if mask else (0, 0)
    head = struct.pack("<4sBBIIHHHH", _MAGIC, 1, flags, height, width,
                       zh, zw, mzh, mzw)
    sections = [rgb["strings"][0], rgb["strings"][1]]
    sections += [mask["strings"][0], mask["strings"][1]] if mask else [b"", b""]
    body = b"".join(struct.pack("<I", len(s)) + s for s in sections)
    return head + body


def unpack_rgba(blob: bytes) -> dict:
    head_len = struct.calcsize("<4sBBIIHHHH")
    magic, ver, flags, h, w, zh, zw, mzh, mzw = struct.unpack(
        "<4sBBIIHHHH", blob[:head_len])
    if magic != _MAGIC or ver != 1:
        raise ValueError("not an rgba_tpu container")
    off = head_len
    sections = []
    for _ in range(4):
        (ln,) = struct.unpack("<I", blob[off:off + 4])
        off += 4
        sections.append(blob[off:off + ln])
        off += ln
    out = {
        "height": h, "width": w,
        "rgb": {"strings": [sections[0], sections[1]], "shape": (zh, zw)},
        "mask": None,
    }
    if flags & 1:
        out["mask"] = {"strings": [sections[2], sections[3]],
                       "shape": (mzh, mzw)}
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

    def encode(self, image: np.ndarray, alpha: np.ndarray) -> bytes:
        """image: (1,H,W,3) float32; alpha: (1,H,W,1) float32."""
        return self.encode_batch(image, alpha)[0]

    def decode(self, blob: bytes) -> np.ndarray:
        """Returns (1, H, W, 4) float32 RGBA."""
        return self.decode_batch([blob])

    # ------------------------------------------------- batched serving API

    def encode_batch(self, images: np.ndarray,
                     alphas: np.ndarray) -> list[bytes]:
        """Compress B same-shaped RGBA images in one batched device pass
        per stage (the per-slice autoregression cost is paid once for the
        whole batch). Returns one container blob per image."""
        import jax.numpy as jnp
        from ..ops.morphology import constraint_rgb

        b, h, w = images.shape[:3]
        opaque = [bool(np.all(alphas[i] == 1.0)) for i in range(b)]
        non_op = [i for i in range(b) if not opaque[i]]
        recon_mask = np.ones_like(alphas)
        mask_comps: dict[int, dict] = {}
        if non_op:
            comps = self.mask_io.compress_batch(mask=alphas[non_op])
            rm = self.mask_io.decompress_batch(comps)
            rm = np.round(np.clip(rm, 0, 1) * 255.0) / 255.0
            rm = np.asarray(constraint_rgb(jnp.asarray(rm)))
            for k, i in enumerate(non_op):
                recon_mask[i] = rm[k]
                mask_comps[i] = comps[k]
        masked = np.where(recon_mask > 0, images, recon_mask)
        rgb_comps = self.rgb_io.compress_batch(image=masked, mask=recon_mask)
        return [pack_rgba(h, w, rgb_comps[i], mask_comps.get(i))
                for i in range(b)]

    def decode_batch(self, blobs: list[bytes]) -> np.ndarray:
        """Decode B same-shaped container blobs; returns (B, H, W, 4)."""
        import jax.numpy as jnp
        from ..ops.morphology import constraint_rgb

        metas = [unpack_rgba(blob) for blob in blobs]
        h, w = metas[0]["height"], metas[0]["width"]
        assert all(m["height"] == h and m["width"] == w for m in metas), \
            "decode_batch requires same-sized images"
        b = len(metas)
        recon_mask = np.ones((b, h, w, 1), np.float32)
        with_mask = [i for i, m in enumerate(metas) if m["mask"] is not None]
        if with_mask:
            rm = self.mask_io.decompress_batch(
                [metas[i]["mask"] for i in with_mask])
            rm = np.round(np.clip(rm, 0, 1) * 255.0) / 255.0
            rm = np.asarray(constraint_rgb(jnp.asarray(rm)))
            for k, i in enumerate(with_mask):
                recon_mask[i] = rm[k]
        rgb = self.rgb_io.decompress_batch([m["rgb"] for m in metas],
                                           mask=recon_mask)
        return np.concatenate([rgb, recon_mask], axis=-1)
