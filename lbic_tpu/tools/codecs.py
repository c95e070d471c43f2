"""Classical-codec wrappers for benchmarking (utils_cai/bench/codecs.py
equivalents): JPEG/WebP via Pillow in-process; BPG/VTM/HM/ffmpeg via
subprocess when the binaries exist (gated, optional)."""

import io
import math
import os
import shutil
import subprocess
import tempfile
import time
from typing import Dict, Tuple

import numpy as np
from PIL import Image


def _metrics(ref: np.ndarray, rec: np.ndarray, nbytes: int) -> Dict:
    import jax.numpy as jnp

    from lbic_tpu.ops import metrics as mx

    mse = float(np.mean((ref.astype(np.float64) / 255
                         - rec.astype(np.float64) / 255) ** 2))
    psnr = -10 * math.log10(max(mse, 1e-12))
    mss = float(mx.ms_ssim(jnp.asarray(ref[None] / 255.0),
                           jnp.asarray(rec[None] / 255.0)))
    h, w = ref.shape[:2]
    return {
        "psnr": psnr,
        "ms-ssim": mss,
        "bpp": nbytes * 8.0 / (h * w),
    }


class PillowCodec:
    """JPEG / WebP (utils_cai/bench/codecs.py:198-253)."""

    fmt = "JPEG"
    ext = "jpg"

    def run(self, img_path: str, quality: int) -> Dict:
        with Image.open(img_path) as im:
            ref = np.asarray(im.convert("RGB"))
        buf = io.BytesIO()
        t0 = time.time()
        Image.fromarray(ref).save(buf, format=self.fmt, quality=quality)
        enc_t = time.time() - t0
        nbytes = buf.tell()
        buf.seek(0)
        t0 = time.time()
        rec = np.asarray(Image.open(buf).convert("RGB"))
        dec_t = time.time() - t0
        out = _metrics(ref, rec, nbytes)
        out.update({"encoding_time": enc_t, "decoding_time": dec_t})
        return out


class JPEG(PillowCodec):
    fmt, ext, name = "JPEG", "jpg", "jpeg"


class WebP(PillowCodec):
    fmt, ext, name = "WEBP", "webp", "webp"


class BPG:
    """BPG via bpgenc/bpgdec subprocess (codecs.py:424-520); requires the
    binaries on PATH."""

    name = "bpg"

    def __init__(self, encoder="bpgenc", decoder="bpgdec",
                 chroma="444", bitdepth="8"):
        self.enc, self.dec = encoder, decoder
        self.chroma, self.bitdepth = chroma, bitdepth

    @staticmethod
    def available() -> bool:
        return shutil.which("bpgenc") is not None

    def run(self, img_path: str, quality: int) -> Dict:
        with Image.open(img_path) as im:
            ref = np.asarray(im.convert("RGB"))
        with tempfile.TemporaryDirectory() as td:
            bit = os.path.join(td, "out.bpg")
            png = os.path.join(td, "out.png")
            t0 = time.time()
            subprocess.run(
                [self.enc, "-o", bit, "-q", str(quality), "-f",
                 self.chroma, "-e", "x265", "-b", self.bitdepth,
                 img_path], check=True, capture_output=True)
            enc_t = time.time() - t0
            nbytes = os.path.getsize(bit)
            t0 = time.time()
            subprocess.run([self.dec, "-o", png, bit], check=True,
                           capture_output=True)
            dec_t = time.time() - t0
            rec = np.asarray(Image.open(png).convert("RGB"))
        out = _metrics(ref, rec, nbytes)
        out.update({"encoding_time": enc_t, "decoding_time": dec_t})
        return out


CODECS = {"jpeg": JPEG, "webp": WebP, "bpg": BPG}
