"""Tools tests: BD-rate math, classical-codec bench, find_close, RD plot."""

import json
import math
import os

import numpy as np
import pytest
from PIL import Image

from lbic_tpu.tools.bd import bd_rate, bd_psnr, bd_from_results


class TestBD:
    def test_identical_curves_zero(self):
        bpp = [0.1, 0.3, 0.6, 1.2]
        psnr = [28.0, 32.0, 35.0, 39.0]
        assert abs(bd_rate(bpp, psnr, bpp, psnr)) < 1e-9
        assert abs(bd_psnr(bpp, psnr, bpp, psnr)) < 1e-9

    def test_uniform_rate_shift(self):
        bpp = np.array([0.1, 0.3, 0.6, 1.2])
        psnr = [28.0, 32.0, 35.0, 39.0]
        # test uses 10% less rate everywhere -> BD-rate = -10%
        r = bd_rate(bpp, psnr, bpp * 0.9, psnr)
        assert abs(r + 10.0) < 0.2, r

    def test_uniform_quality_shift(self):
        bpp = [0.1, 0.3, 0.6, 1.2]
        psnr = np.array([28.0, 32.0, 35.0, 39.0])
        d = bd_psnr(bpp, psnr, bpp, psnr + 0.5)
        assert abs(d - 0.5) < 0.05, d

    def test_from_results_schema(self):
        a = {"results": {"bpp": [0.1, 0.5, 1.0], "psnr": [28, 33, 38]}}
        b = {"results": {"bpp": [0.09, 0.45, 0.9], "psnr": [28, 33, 38]}}
        out = bd_from_results(a, b)
        assert out["bd_rate_pct"] < -5


@pytest.fixture
def imgdir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(2):
        # smooth-ish image so JPEG behaves sanely
        a = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        a = np.asarray(Image.fromarray(a).resize((192, 176)))
        Image.fromarray(a).save(tmp_path / f"i{i}.png")
    return tmp_path


def test_bench_codecs_jpeg(imgdir, tmp_path):
    from lbic_tpu.tools.bench_codecs import bench

    out = bench("jpeg", str(imgdir), [20, 80])
    r = out["results"]
    assert len(r["psnr"]) == 2
    assert r["psnr"][1] > r["psnr"][0]      # higher quality -> higher psnr
    assert r["bpp"][1] > r["bpp"][0]


def test_find_close(imgdir):
    from lbic_tpu.data.dataset import list_images
    from lbic_tpu.tools.find_close import find_close

    img = list_images(str(imgdir))[0]
    q, r = find_close("jpeg", img, 1.0, metric="bpp")
    assert 1 <= q <= 100
    assert abs(r["bpp"] - 1.0) < 0.6  # coarse: jpeg q steps are chunky


def test_plot_rd(tmp_path):
    from lbic_tpu.tools.plot_rd import plot

    p = tmp_path / "a.json"
    json.dump({"name": "a", "results": {"bpp": [0.1, 0.5],
                                        "psnr": [30, 35]}}, open(p, "w"))
    out = plot([str(p)], output=str(tmp_path / "rd.png"))
    assert os.path.getsize(out) > 1000


def test_jpeg2000_codec(imgdir):
    """JPEG2000 (Pillow/OpenJPEG) keeps the ascending-quality convention
    and beats JPEG-like rates at its high end."""
    from lbic_tpu.tools.codecs import CODECS

    assert CODECS["jpeg2000"].available()
    codec = CODECS["jpeg2000"]()
    img = str(sorted(imgdir.glob("*.png"))[0])
    lo = codec.run(img, 10)
    hi = codec.run(img, 90)
    assert hi["psnr"] > lo["psnr"]
    assert hi["bpp"] > lo["bpp"]
    assert lo["bpp"] > 0


def test_yuv444_roundtrip():
    """RGB -> YUV444 -> RGB for the reference-software shims is within
    rounding of identity."""
    from lbic_tpu.tools.codecs import _rgb_to_yuv444, _yuv444_to_rgb

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (31, 17, 3), dtype=np.uint8)
    rec = _yuv444_to_rgb(_rgb_to_yuv444(rgb))
    assert np.max(np.abs(rec.astype(int) - rgb.astype(int))) <= 2


def test_gated_codecs_registry():
    """Subprocess codecs are registered but gate on missing binaries
    (none ship in this environment); bench refuses them cleanly."""
    from lbic_tpu.tools.bench_codecs import bench
    from lbic_tpu.tools.codecs import CODECS

    for name in ("vtm", "hm", "av1", "tfci", "bpg"):
        assert name in CODECS
        if not CODECS[name].available():
            with pytest.raises(SystemExit):
                bench(name, ".", [30])


def test_bd_duplicate_anchor_points():
    """Pillow clamps very low JPEG qualities to identical files; BD must
    collapse the duplicate points instead of failing (bd._dedup)."""
    anchor = {"results": {"bpp": [0.22, 0.22, 0.5, 1.0, 2.0],
                          "psnr": [22.5, 22.5, 29.0, 32.0, 34.0]}}
    ours = {"results": {"bpp": [0.1, 0.4, 0.9], "psnr": [24.0, 28.0, 33.0]}}
    r = bd_from_results(anchor, ours)
    assert math.isfinite(r["bd_rate_pct"])
    assert math.isfinite(r["bd_psnr_db"])
    assert r["bd_rate_pct"] < 0  # ours dominates this anchor


def test_rd_campaign_prepublish(imgdir, tmp_path, monkeypatch):
    """A restarted campaign publishes lbic.json / bd.txt / rd.png from
    the already-finished lambda points BEFORE training anything (the
    resilience contract of tools/rd_campaign.py)."""
    from lbic_tpu.tools import rd_campaign

    corpus = tmp_path / "corpus"
    for split in ("train", "valid"):
        (corpus / split).mkdir(parents=True)
    (corpus / "test").mkdir()
    for p in imgdir.glob("*.png"):
        (corpus / "test" / p.name).write_bytes(p.read_bytes())

    work = tmp_path / "work"
    points = {117.0: (0.15, 26.0), 3000.0: (1.2, 38.0)}
    for lam, (bpp, psnr) in points.items():
        d = work / f"exp_{lam}" / "out"
        d.mkdir(parents=True)
        res = {"name": "x", "results": {
            "psnr": [psnr], "ms-ssim": [0.9], "ms-ssimdb": [10.0],
            "bpp": [bpp], "encoding_time": [0.1], "decoding_time": [0.1]}}
        (d / "results.json").write_text(json.dumps(res))

    out = tmp_path / "out"
    rc = rd_campaign.main([
        "--corpus", str(corpus), "--out", str(out), "--work", str(work),
        "--lambdas", "117.0", "3000.0"])
    assert rc == 0, (out / "bd.txt").read_text()
    bd_txt = (out / "bd.txt").read_text()
    assert "BD-rate" in bd_txt and "failed" not in bd_txt
    ours = json.loads((out / "lbic.json").read_text())["results"]
    assert ours["bpp"] == sorted(ours["bpp"])
    assert (out / "rd.png").is_file()
    assert (out / "jpeg.json").is_file() and (out / "webp.json").is_file()


def test_rd_campaign_warm_init_selection(tmp_path):
    """--warm-seq picks the best-rr checkpoint of the NEAREST finished
    lower lambda, sorted numerically (acl itr 10 beats itr 9), and
    returns None when no lower neighbor has a usable snapshot."""
    from lbic_tpu.tools.rd_campaign import _warm_init_checkpoint

    work = tmp_path / "work"
    for lam, itrs in ((117.0, (0, 1)), (435.0, (2, 9, 10))):
        d = work / f"exp_{lam}" / "checkpoints"
        d.mkdir(parents=True)
        for i in itrs:
            (d / f"model_best_acl_{i}rr.pkl").write_bytes(b"x")
    # nearest lower neighbor of 845 is 435; numeric max itr is 10
    got = _warm_init_checkpoint(str(work), [117.0, 435.0], 845.0)
    assert got.endswith(os.path.join("exp_435.0", "checkpoints",
                                     "model_best_acl_10rr.pkl"))
    # first lambda: no lower neighbor
    assert _warm_init_checkpoint(str(work), [], 117.0) is None
    # lower neighbor exists but has no rr snapshot
    empty = work / "exp_50.0" / "checkpoints"
    empty.mkdir(parents=True)
    assert _warm_init_checkpoint(str(work), [50.0], 60.0) is None


def test_corpus_split_no_shifted_valid_overlap():
    """Leakage guarantee (advisor r4): no half-stride shifted train crop
    may overlap any valid cell, across many rng draws and odd sizes."""
    from lbic_tpu.tools.builtin_corpus import split_cells

    rng = np.random.default_rng(123)
    patch = 16
    saw_valid = saw_shifted = 0
    for _ in range(200):
        h = int(rng.integers(patch, 6 * patch))
        w = int(rng.integers(patch, 6 * patch))
        aligned, shifted = split_cells(h, w, patch, rng, valid_one_in=3)
        valid = [(y, x) for (y, x, s) in aligned if s == "valid"]
        saw_valid += len(valid)
        saw_shifted += len(shifted)
        for (y, x) in shifted:
            assert 0 <= y and 0 <= x
            assert y + patch <= h and x + patch <= w
            for (vy, vx) in valid:
                no_overlap = (y >= vy + patch or vy >= y + patch or
                              x >= vx + patch or vx >= x + patch)
                assert no_overlap, (h, w, (y, x), (vy, vx))
    # the property must have been exercised, not vacuously true
    assert saw_valid > 50 and saw_shifted > 50


def test_rd_campaign_crash_retry_resume(imgdir, tmp_path, monkeypatch):
    """VERDICT r4 #1: a mid-training crash must not kill the campaign —
    the driver retries the lambda point in a fresh child process, which
    resumes from the checkpoint and completes. Fault injection:
    LBIC_FAULT_ONCE crashes the agent exactly once after the first
    epoch's checkpoint."""
    from lbic_tpu.tools import rd_campaign

    corpus = tmp_path / "corpus"
    rng = np.random.default_rng(1)
    for split, n, size in (("train", 4, 24), ("valid", 2, 24)):
        (corpus / split).mkdir(parents=True)
        for i in range(n):
            a = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(a).save(corpus / split / f"img{i}.png")
    (corpus / "test").mkdir()
    for p in imgdir.glob("*.png"):
        (corpus / "test" / p.name).write_bytes(p.read_bytes())

    flag = tmp_path / "fault_flag"
    monkeypatch.setenv("LBIC_FAULT_ONCE", str(flag))
    out, work = tmp_path / "out", tmp_path / "work"
    rc = rd_campaign.main([
        "--corpus", str(corpus), "--out", str(out), "--work", str(work),
        "--lambdas", "100.0", "--n", "16", "--m", "8",
        "--block-size", "4", "--ks", "3", "1", "1", "1",
        "--batch", "2", "--patch", "16", "--acl-itrs", "1",
        "--epochs-itr0", "2", "--epochs-per-acl", "2",
        "--patience", "0", "--retries", "2"])
    # the fault fired...
    assert flag.is_file()
    # ...and the campaign still completed the point end-to-end (rc is
    # nonzero only because BD needs >= 2 curve points — asserted via
    # the absence of FAILED_POINTS instead)
    res = json.loads((out / "lbic.json").read_text())["results"]
    assert len(res["bpp"]) == 1 and res["bpp"][0] > 0
    marker = work / "exp_100.0" / "out" / "results.json"
    assert marker.is_file()
    assert not (out / "FAILED_POINTS.txt").exists()
