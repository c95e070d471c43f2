"""Recorded-fixture tests for the gated subprocess codec wrappers
(BPG/VTM/HM/AV1/TFCI, tools/codecs.py). The real binaries don't exist
in this environment, so each test installs FAKE executables on PATH
that (a) record the argv they were invoked with and (b) produce a
decodable round-trip artifact — exercising the wrappers' argument
construction, temp-file plumbing, YUV conversion, and metric
computation end to end."""

import json
import os
import stat
import sys

import numpy as np
import pytest
from PIL import Image

from lbic_tpu.tools import codecs


def _write_stub(path, body):
    with open(path, "w") as f:
        f.write(f"#!{sys.executable}\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def img(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(a).save(p)
    return str(p), a


@pytest.fixture
def stub_bin(tmp_path, monkeypatch):
    d = tmp_path / "bin"
    d.mkdir()
    monkeypatch.setenv("PATH", f"{d}:{os.environ['PATH']}")
    rec = tmp_path / "argv.json"

    def install(name, body):
        _write_stub(str(d / name), body.replace("ARGV_JSON", str(rec)))

    return install, rec


def _argv(rec):
    with open(rec) as f:
        return json.load(f)


def test_yuv444_round_trip():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (16, 18, 3), dtype=np.uint8)
    yuv = codecs._rgb_to_yuv444(rgb)
    assert yuv.shape == (3, 16, 18)
    back = codecs._yuv444_to_rgb(yuv)
    # BT.601 8-bit round trip is within +-2 codes
    assert np.max(np.abs(back.astype(int) - rgb.astype(int))) <= 2


def test_bpg_wrapper(img, stub_bin):
    path, ref = img
    install, rec = stub_bin
    # fake bpgenc: "bitstream" is the PNG itself; record argv
    install("bpgenc", """
import json, shutil, sys
args = sys.argv[1:]
json.dump(args, open("ARGV_JSON", "w"))
out = args[args.index("-o") + 1]
shutil.copy(args[-1], out)
""")
    install("bpgdec", """
import shutil, sys
args = sys.argv[1:]
out = args[args.index("-o") + 1]
shutil.copy(args[-1], out)
""")
    assert codecs.BPG.available()
    out = codecs.BPG().run(path, quality=29)
    argv = _argv(rec)
    assert "-q" in argv and argv[argv.index("-q") + 1] == "29"
    assert argv[argv.index("-f") + 1] == "444"
    # lossless fake round trip -> psnr capped, ms-ssim <= 1, bpp > 0
    assert out["bpp"] > 0
    assert out["psnr"] >= 100
    assert 0 < out["ms-ssim"] <= 1.0
    assert out["encoding_time"] >= 0 and out["decoding_time"] >= 0


YUV_ENC_STUB = """
import json, shutil, sys
args = sys.argv[1:]
json.dump(args, open("ARGV_JSON", "w"))
def val(flag):
    return args[args.index(flag) + 1]
shutil.copy(val("-i"), val("-b"))
"""

YUV_DEC_STUB = """
import shutil, sys
args = sys.argv[1:]
def val(flag):
    return args[args.index(flag) + 1]
shutil.copy(val("-b"), val("-o"))
"""


@pytest.mark.parametrize("cls,encb,decb", [
    (codecs.VTM, "EncoderApp", "DecoderApp"),
    (codecs.HM, "TAppEncoder", "TAppDecoder"),
])
def test_vtm_hm_wrappers(cls, encb, decb, img, stub_bin):
    path, ref = img
    install, rec = stub_bin
    install(encb, YUV_ENC_STUB)
    install(decb, YUV_DEC_STUB)
    assert cls.available()
    out = cls().run(path, quality=32)
    argv = _argv(rec)
    h, w = ref.shape[:2]
    assert argv[argv.index("-q") + 1] == "32"
    assert argv[argv.index("-wdt") + 1] == str(w)
    assert argv[argv.index("-hgt") + 1] == str(h)
    assert "--InputChromaFormat=444" in argv
    # fake is YUV-lossless: only the 601 conversion error remains
    assert out["psnr"] > 45
    assert out["bpp"] > 0


def test_av1_wrapper(img, stub_bin):
    path, ref = img
    install, rec = stub_bin
    install("aomenc", """
import json, shutil, sys
args = sys.argv[1:]
json.dump(args, open("ARGV_JSON", "w"))
out = args[args.index("-o") + 1]
shutil.copy(args[-1], out)
""")
    install("aomdec", """
import shutil, sys
args = sys.argv[1:]
out = args[args.index("-o") + 1]
shutil.copy(args[0], out)
""")
    assert codecs.AV1.available()
    out = codecs.AV1().run(path, quality=40)
    argv = _argv(rec)
    h, w = ref.shape[:2]
    assert "--cq-level=40" in argv
    assert argv[argv.index("-w") + 1] == str(w)
    assert argv[argv.index("-h") + 1] == str(h)
    assert "--i444" in argv
    assert out["psnr"] > 45
    assert out["bpp"] > 0


def test_tfci_wrapper(img, stub_bin):
    path, ref = img
    install, rec = stub_bin
    install("tfci", """
import json, shutil, sys
args = sys.argv[1:]
if args[0] == "compress":
    json.dump(args, open("ARGV_JSON", "w"))
    shutil.copy(args[2], args[3])
else:
    shutil.copy(args[1], args[2])
""")
    assert codecs.TFCI.available()
    out = codecs.TFCI(model="bmshj2018-factorized-mse").run(path, 3)
    argv = _argv(rec)
    assert argv[1] == "bmshj2018-factorized-mse-3"
    assert out["psnr"] >= 100
    assert out["bpp"] > 0


def test_unavailable_without_stub(monkeypatch, tmp_path):
    monkeypatch.setenv("PATH", str(tmp_path))
    for cls in (codecs.BPG, codecs.VTM, codecs.HM, codecs.AV1,
                codecs.TFCI):
        assert not cls.available()
