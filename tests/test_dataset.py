"""Dataset unit tests: ACL pairing, RAM cache, and the uint8 transfer
mode (loaders ship raw uint8; jitted steps convert on device —
train/step.py _as_image)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from lbic_tpu.data.dataset import BatchLoader, ImageDatasetACL, acl_dir
from lbic_tpu.train.step import _as_image


@pytest.fixture
def paired_dirs(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "train"
    root.mkdir()
    zdir = tmp_path / (root.name + "__acl_A_2")
    zdir.mkdir()
    for i in range(4):
        a = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
        Image.fromarray(a).save(root / f"i{i}.png")
        Image.fromarray(b).save(zdir / f"i{i}.png")
    return str(root)


def test_uint8_mode_matches_float_mode(paired_dirs):
    fds = ImageDatasetACL([paired_dirs], acl_itr=2, patch_size=16,
                          uint8=False)
    uds = ImageDatasetACL([paired_dirs], acl_itr=2, patch_size=16,
                          uint8=True)
    for i in range(4):
        # same rng stream -> same crop/flips
        xf, zf = fds.get(i, np.random.default_rng(7))
        xu, zu = uds.get(i, np.random.default_rng(7))
        assert xu.dtype == np.uint8 and zu.dtype == np.uint8
        np.testing.assert_allclose(
            np.asarray(_as_image(jnp.asarray(xu))), xf, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(_as_image(jnp.asarray(zu))), zf, atol=1e-7)


def test_uint8_itr0_pair_aliases(paired_dirs):
    ds = ImageDatasetACL([paired_dirs], acl_itr=0, uint8=True)
    x, z = ds.get(0, rng=None)
    np.testing.assert_array_equal(x, z)


def test_cache_serves_fresh_decodes_once(paired_dirs, monkeypatch):
    ds = ImageDatasetACL([paired_dirs], acl_itr=2, uint8=True)
    a0 = ds.get(0, rng=None)
    opens = []
    real_open = Image.open
    monkeypatch.setattr(Image, "open",
                        lambda p, *a: opens.append(p) or real_open(p, *a))
    a1 = ds.get(0, rng=None)
    assert not opens  # served from cache
    np.testing.assert_array_equal(a0[0], a1[0])
    np.testing.assert_array_equal(a0[1], a1[1])


def test_float_passthrough_in_as_image():
    x = jnp.asarray(np.float32([[0.25]]))
    assert _as_image(x) is x


def test_batchloader_uint8_batches(paired_dirs):
    ds = ImageDatasetACL([paired_dirs], acl_itr=2, patch_size=16,
                         uint8=True)
    loader = BatchLoader(ds, 2, shuffle=True, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    for x, z in batches:
        assert x.dtype == np.uint8 and z.dtype == np.uint8
        assert x.shape == (2, 16, 16, 3)


def test_batchloader_propagates_worker_errors(tmp_path):
    """A failure inside the prefetch thread (e.g. missing ACL recon dir)
    must surface in the consumer as an exception — a silently-dead
    worker used to hang the training loop forever on queue.get()."""
    import numpy as np
    from PIL import Image

    from lbic_tpu.data.dataset import BatchLoader, ImageDatasetACL

    d = tmp_path / "train"
    d.mkdir()
    a = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(a).save(d / "img0.png")
    # acl_itr=1 with no __acl_A_1 sibling dir -> ds.get raises in worker
    ds = ImageDatasetACL([str(d)], acl_itr=1, patch_size=8)
    loader = BatchLoader(ds, 1, shuffle=False, drop_last=False)
    with pytest.raises(Exception):
        next(iter(loader))
