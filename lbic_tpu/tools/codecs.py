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
    import jax
    import jax.numpy as jnp

    from lbic_tpu.ops import metrics as mx

    mse = float(np.mean((ref.astype(np.float64) / 255
                         - rec.astype(np.float64) / 255) ** 2))
    psnr = -10 * math.log10(max(mse, 1e-12))
    # host-side anchor math: pin to the CPU backend — the non-jitted
    # ms_ssim dispatches ~50 small ops per call, which over the axon
    # TPU tunnel costs one slow remote compile per op x shape (a cold
    # cache turned the anchor sweep into tens of minutes)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
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

    @staticmethod
    def available() -> bool:
        return True

    def _save_args(self, quality: int) -> Dict:
        return {"quality": quality}

    def run(self, img_path: str, quality: int) -> Dict:
        with Image.open(img_path) as im:
            ref = np.asarray(im.convert("RGB"))
        buf = io.BytesIO()
        t0 = time.time()
        Image.fromarray(ref).save(buf, format=self.fmt,
                                  **self._save_args(quality))
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


class JPEG2000(PillowCodec):
    """JPEG 2000 via Pillow/OpenJPEG (utils_cai/bench/codecs.py:375-422
    uses ffmpeg; Pillow's irreversible 9/7 path is the in-process
    equivalent). `quality` keeps the registry's ascending 1..100
    convention (find_close bisects on it); it maps to a compression
    ratio of 101 - quality (size = raw / ratio)."""

    fmt, ext, name = "JPEG2000", "jp2", "jpeg2000"

    @staticmethod
    def available() -> bool:
        from PIL import features

        return bool(features.check("jpg_2000"))

    def _save_args(self, quality: int) -> Dict:
        return {"quality_mode": "rates",
                "quality_layers": [max(1, 101 - int(quality))],
                "irreversible": True}


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


# ---------------------------------------------------------------------------
# Gated subprocess shims (utils_cai/bench/codecs.py:375-1029 equivalents).
# None of these binaries ship in this environment; each class gates on
# available() and bench_codecs/find_close skip unavailable entries.

def _rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    """Full-range BT.601 RGB -> YUV444, uint8 planar (3, H, W)."""
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    yuv = rgb.astype(np.float64) @ m.T
    yuv[..., 1:] += 128.0
    return np.clip(np.rint(yuv), 0, 255).astype(np.uint8).transpose(2, 0, 1)


def _yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """Inverse of _rgb_to_yuv444; yuv planar (3, H, W) -> RGB (H, W, 3)."""
    y = yuv[0].astype(np.float64)
    u = yuv[1].astype(np.float64) - 128.0
    v = yuv[2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.rint(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


class _YUVRefSubprocessCodec:
    """Shared shell for reference-software codecs that eat raw YUV444
    (VTM/HM): write yuv, run encoder -> bitstream, run decoder -> yuv,
    convert back. Subclasses set enc/dec binaries and arg builders."""

    enc_bin = dec_bin = ""
    name = "yuvref"

    def __init__(self, config_path: str = ""):
        # encoder .cfg file (the reference ships the software's own
        # encoder_intra_*.cfg; path must be supplied by the user)
        self.config_path = config_path

    @classmethod
    def available(cls) -> bool:
        return (shutil.which(cls.enc_bin) is not None
                and shutil.which(cls.dec_bin) is not None)

    def enc_args(self, yuv, bit, w, h, quality):  # pragma: no cover - gated
        raise NotImplementedError

    def dec_args(self, bit, yuv):  # pragma: no cover - gated
        raise NotImplementedError

    def run(self, img_path: str, quality: int) -> Dict:
        with Image.open(img_path) as im:
            ref = np.asarray(im.convert("RGB"))
        h, w = ref.shape[:2]
        with tempfile.TemporaryDirectory() as td:
            yuv_in = os.path.join(td, "in.yuv")
            bit = os.path.join(td, "out.bin")
            yuv_out = os.path.join(td, "out.yuv")
            _rgb_to_yuv444(ref).tofile(yuv_in)
            t0 = time.time()
            subprocess.run(self.enc_args(yuv_in, bit, w, h, quality),
                           check=True, capture_output=True)
            enc_t = time.time() - t0
            nbytes = os.path.getsize(bit)
            t0 = time.time()
            subprocess.run(self.dec_args(bit, yuv_out), check=True,
                           capture_output=True)
            dec_t = time.time() - t0
            rec_yuv = np.fromfile(yuv_out, np.uint8)[:3 * h * w]
            rec = _yuv444_to_rgb(rec_yuv.reshape(3, h, w))
        out = _metrics(ref, rec, nbytes)
        out.update({"encoding_time": enc_t, "decoding_time": dec_t})
        return out


class VTM(_YUVRefSubprocessCodec):
    """VVC test model, all-intra single frame (codecs.py:639-768)."""

    enc_bin, dec_bin, name = "EncoderApp", "DecoderApp", "vtm"

    def enc_args(self, yuv, bit, w, h, quality):
        args = [self.enc_bin, "-i", yuv, "-b", bit, "-q", str(quality),
                "-wdt", str(w), "-hgt", str(h), "-fr", "1", "-f", "1",
                "--InputChromaFormat=444", "--ConformanceWindowMode=1",
                "--InputBitDepth=8", "--OutputBitDepth=8"]
        if self.config_path:
            args += ["-c", self.config_path]
        return args

    def dec_args(self, bit, yuv):
        return [self.dec_bin, "-b", bit, "-o", yuv, "-d", "8"]


class HM(_YUVRefSubprocessCodec):
    """HEVC test model, all-intra single frame (codecs.py:770-891)."""

    enc_bin, dec_bin, name = "TAppEncoder", "TAppDecoder", "hm"

    def enc_args(self, yuv, bit, w, h, quality):
        args = [self.enc_bin, "-i", yuv, "-b", bit, "-q", str(quality),
                "-wdt", str(w), "-hgt", str(h), "-fr", "1", "-f", "1",
                "--InputChromaFormat=444", "--ConformanceWindowMode=1",
                "--InputBitDepth=8"]
        if self.config_path:
            args += ["-c", self.config_path]
        return args

    def dec_args(self, bit, yuv):
        return [self.dec_bin, "-b", bit, "-o", yuv, "-d", "8"]


class AV1(_YUVRefSubprocessCodec):
    """libaom still-image (codecs.py:893-1029), quality = cq-level."""

    enc_bin, dec_bin, name = "aomenc", "aomdec", "av1"

    def enc_args(self, yuv, bit, w, h, quality):
        return [self.enc_bin, "-w", str(w), "-h", str(h), "--fps=1/1",
                "--limit=1", "--input-bit-depth=8", "--cpu-used=0",
                "--end-usage=q", f"--cq-level={quality}",
                "--i444", "--ivf", "-o", bit, yuv]

    def dec_args(self, bit, yuv):
        return [self.dec_bin, bit, "--rawvideo", "-o", yuv]


class TFCI:
    """tensorflow-compression's tfci CLI (codecs.py:566-637): pretrained
    bmshj2018/mbt2018 baselines. quality indexes the model's RD point."""

    name = "tfci"

    def __init__(self, model: str = "bmshj2018-factorized-mse"):
        self.model = model

    @staticmethod
    def available() -> bool:
        return shutil.which("tfci") is not None

    def run(self, img_path: str, quality: int) -> Dict:
        with Image.open(img_path) as im:
            ref = np.asarray(im.convert("RGB"))
        with tempfile.TemporaryDirectory() as td:
            bit = os.path.join(td, "out.tfci")
            png = os.path.join(td, "out.png")
            t0 = time.time()
            subprocess.run(
                ["tfci", "compress", f"{self.model}-{quality}",
                 img_path, bit], check=True, capture_output=True)
            enc_t = time.time() - t0
            nbytes = os.path.getsize(bit)
            t0 = time.time()
            subprocess.run(["tfci", "decompress", bit, png], check=True,
                           capture_output=True)
            dec_t = time.time() - t0
            rec = np.asarray(Image.open(png).convert("RGB"))
        out = _metrics(ref, rec, nbytes)
        out.update({"encoding_time": enc_t, "decoding_time": dec_t})
        return out


CODECS = {"jpeg": JPEG, "webp": WebP, "bpg": BPG, "jpeg2000": JPEG2000,
          "vtm": VTM, "hm": HM, "av1": AV1, "tfci": TFCI}
