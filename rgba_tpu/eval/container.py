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
        import jax.numpy as jnp
        from ..ops.morphology import constraint_rgb

        h, w = image.shape[1:3]
        opaque = bool(np.all(alpha == 1.0))
        if opaque:
            mask_comp = None
            recon_mask = np.ones_like(alpha)
        else:
            mask_comp = self.mask_io.compress(mask=alpha)
            rm = self.mask_io.decompress(mask_comp)
            rm = np.round(np.clip(rm, 0, 1) * 255.0) / 255.0
            recon_mask = np.asarray(constraint_rgb(jnp.asarray(rm)))
        masked = np.where(recon_mask > 0, image, recon_mask)
        rgb_comp = self.rgb_io.compress(image=masked, mask=recon_mask)
        return pack_rgba(h, w, rgb_comp, mask_comp)

    def decode(self, blob: bytes) -> np.ndarray:
        """Returns (1, H, W, 4) float32 RGBA."""
        import jax.numpy as jnp
        from ..ops.morphology import constraint_rgb

        meta = unpack_rgba(blob)
        h, w = meta["height"], meta["width"]
        if meta["mask"] is None:
            recon_mask = np.ones((1, h, w, 1), np.float32)
        else:
            rm = self.mask_io.decompress(meta["mask"])
            rm = np.round(np.clip(rm, 0, 1) * 255.0) / 255.0
            recon_mask = np.asarray(constraint_rgb(jnp.asarray(rm)))
        rgb = self.rgb_io.decompress(meta["rgb"], mask=recon_mask)
        return np.concatenate([rgb, recon_mask], axis=-1)
