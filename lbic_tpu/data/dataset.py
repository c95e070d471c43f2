"""Image datasets + ACL paired loading.

Re-implements the reference's data layer (dataloaders/image_dl_ACL.py)
without torch: numpy + PIL, with a thread that prefetches the next batch
while the device computes (the reference used 4 torch DataLoader workers,
image_dl_ACL.py:43).

Semantics preserved:
  * ImageDatasetACL returns (x, zhat) pairs where zhat comes from the
    sibling directory `<root>__acl_<session>_<acl_itr>`; at ACL iteration 0
    zhat = x (image_dl_ACL.py:82-92, 144-155).
  * joint random crop + joint h/v flips of the pair (image_dl_ACL.py:146-152);
  * gen_train_set modes force batch 1 / no shuffle / no crop
    (image_dl_ACL.py:19, 46-52);
  * recon writers save x̂ PNGs into the next iteration's sibling dir
    (image_dl_ACL.py:157-171).

Images are float32 in [-0.5, 0.5], NHWC (the reference's ToTensor() - 0.5).
"""

import os
import queue
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def list_images(root: str) -> List[str]:
    return sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.lower().endswith(IMG_EXTS)
    )


def load_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 in [-0.5, 0.5]."""
    with Image.open(path) as im:
        a = np.asarray(im.convert("RGB"), dtype=np.float32)
    return a / 255.0 - 0.5


def save_image(path: str, x: np.ndarray) -> None:
    """x: (H, W, 3) in [-0.5, 0.5] -> 8-bit PNG (the ACL disk round-trip,
    image_dl_ACL.py:163-169)."""
    a = np.clip((x + 0.5) * 255.0, 0, 255.0)
    # compress_level=1: PNG is lossless at every level; zlib effort only
    # changes file size, and recon-set regeneration (thousands of writes
    # per ACL iteration) is PNG-encode-bound on this host
    Image.fromarray(np.round(a).astype(np.uint8)).save(
        path, compress_level=1)


def acl_dir(root: str, session: str, acl_itr: int) -> str:
    """Sibling recon dir name (image_dl_ACL.py:86)."""
    return f"{root.rstrip(os.sep)}__acl_{session}_{acl_itr}"


class ImageDatasetACL:
    """Paired (x, zhat) dataset for ACL training."""

    def __init__(self, roots: Sequence[str], session: str = "A",
                 acl_itr: int = 0, patch_size: int = 0, augment: bool = True,
                 zhat_ext: Optional[str] = None, cache: bool = True,
                 uint8: bool = False):
        """zhat_ext: explicit sibling-dir suffix for the zhat pairs (the
        reference's zhat_fldr_ext, image_dl_ACL.py:83-86 — e.g.
        '__recurecos_<lambda>' when training the post-proc net).

        cache: keep decoded images in RAM as uint8 (a 256x256 patch
        corpus is a few hundred MB; PNG decode dominated epoch time
        otherwise). The cache is per-instance, and loaders are rebuilt
        every ACL iteration, so regenerated recon dirs are never served
        stale.

        uint8: return raw uint8 pixel pairs instead of float32 in
        [-0.5, 0.5]; the jitted train/eval steps convert on device
        (train/step.py _as_image) so the host->device transfer is 4x
        smaller — the bottleneck on a tunneled TPU."""
        self.roots = [r for r in roots if r]
        self._cache: Optional[dict] = {} if cache else None
        self.uint8 = uint8
        self.session = session
        self.acl_itr = acl_itr
        self.patch_size = patch_size
        self.augment = augment
        self.files: List[str] = []
        self.zfiles: List[str] = []
        for root in self.roots:
            fs = list_images(root)
            self.files += fs
            if zhat_ext is not None:
                zd = root.rstrip(os.sep) + zhat_ext
                self.zfiles += [
                    os.path.join(zd, os.path.basename(f)) for f in fs
                ]
            elif acl_itr == 0:
                self.zfiles += fs
            else:
                zd = acl_dir(root, session, acl_itr)
                self.zfiles += [
                    os.path.join(zd, os.path.basename(f)) for f in fs
                ]
        assert len(self.files) == len(self.zfiles)

    def __len__(self):
        return len(self.files)

    def _load_pair_u8(self, i: int):
        """(x, z) as uint8; z is None when it aliases x (acl_itr 0)."""
        hit = self._cache.get(i) if self._cache is not None else None
        if hit is None:
            with Image.open(self.files[i]) as im:
                xu = np.asarray(im.convert("RGB"), dtype=np.uint8)
            if self.zfiles[i] == self.files[i]:
                zu = None
            else:
                with Image.open(self.zfiles[i]) as im:
                    zu = np.asarray(im.convert("RGB"), dtype=np.uint8)
            hit = (xu, zu)
            if self._cache is not None:
                self._cache[i] = hit
        return hit

    def get(self, i: int, rng: Optional[np.random.Generator] = None):
        x, z = self._load_pair_u8(i)
        z_is_x = z is None
        if z_is_x:
            z = x
        assert x.shape == z.shape, (self.files[i], x.shape, z.shape)
        ps = self.patch_size
        if ps and rng is not None:
            h, w = x.shape[:2]
            if h < ps or w < ps:  # small-image refit (image_dl.py:60-66)
                x = _pad_min(x, ps)
                z = x if z_is_x else _pad_min(z, ps)
                h, w = x.shape[:2]
            top = int(rng.integers(0, h - ps + 1))
            left = int(rng.integers(0, w - ps + 1))
            x = x[top:top + ps, left:left + ps]
            z = z[top:top + ps, left:left + ps]
        if self.augment and rng is not None:
            if rng.random() < 0.5:  # joint h-flip (image_dl_ACL.py:146-148)
                x, z = x[:, ::-1], z[:, ::-1]
            if rng.random() < 0.5:  # joint v-flip
                x, z = x[::-1], z[::-1]
        if not self.uint8:
            x = x.astype(np.float32) / 255.0 - 0.5
            z = x if z_is_x else z.astype(np.float32) / 255.0 - 0.5
        return np.ascontiguousarray(x), np.ascontiguousarray(z)


def _pad_min(x, ps):
    ph = max(0, ps - x.shape[0])
    pw = max(0, ps - x.shape[1])
    return np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")


class BatchLoader:
    """Shuffled batch iterator with one background prefetch thread.

    shard=(rank, count): multi-host per-process data sharding — every
    process draws the SAME epoch permutation (seeded by (seed, epoch)),
    then takes a strided, equal-length slice, so all processes iterate
    the same number of batches (required: the train step is a global
    collective program)."""

    def __init__(self, ds: ImageDatasetACL, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 shard: Optional[Tuple[int, int]] = None):
        self.ds = ds
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.shard = shard
        self._epoch = 0

    def _shard_len(self):
        n = len(self.ds)
        if self.shard:
            n = n // self.shard[1]
        return n

    def __len__(self):
        n = self._shard_len()
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            # epoch-stable permutation, identical on every process
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        self._epoch += 1
        if self.shard:
            rank, count = self.shard
            order = order[rank::count][: self._shard_len()]
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def worker():
            # any failure (e.g. a missing ACL recon dir) must reach the
            # consumer — a silently-dead worker would hang q.get() forever
            try:
                for b in range(nb):
                    idx = order[b * self.bs:(b + 1) * self.bs]
                    xs, zs = [], []
                    for i in idx:
                        x, z = self.ds.get(int(i), self.rng)
                        xs.append(x)
                        zs.append(z)
                    q.put((np.stack(xs), np.stack(zs)))
                q.put(None)
            except BaseException as e:  # noqa: BLE001 — relayed, not hidden
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
