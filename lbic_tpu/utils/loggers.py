"""Rate-distortion meters/loggers (loggers/rate.py equivalents).

RateDistortionMeter accumulates (loss, dist, rate) per iteration and
yields epoch means; RDLogger formats a log line with PSNR / SSIM-dB
conversion and wall-clock (loggers/rate.py:50-160). Meters are
checkpointable (state_dict/load_state_dict, rate.py:85-94) so epoch
statistics survive resume."""

import logging
import math
import time


class RateDistortionMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.count = 0
        self.loss = 0.0
        self.dist = 0.0
        self.rate = 0.0

    def update(self, loss, dist, rate, n=1):
        self.count += n
        self.loss += float(loss) * n
        self.dist += float(dist) * n
        self.rate += float(rate) * n

    @property
    def avg(self):
        c = max(self.count, 1)
        return (self.loss / c, self.dist / c, self.rate / c)

    def state_dict(self):
        return {"count": self.count, "loss": self.loss,
                "dist": self.dist, "rate": self.rate}

    def load_state_dict(self, d):
        # checkpoints numpy-ify scalars; coerce back so accumulation and
        # downstream JSON dumps stay on python floats
        self.count, self.loss = int(d["count"]), float(d["loss"])
        self.dist, self.rate = float(d["dist"]), float(d["rate"])


class RDLogger:
    """Epoch-level RD logging: distortion shown as PSNR (mse mode) or
    dB (ssim modes), matching loggers/rate.py:120-160 output style."""

    def __init__(self, name: str, distortion: str = "mse",
                 dist_is_psnr: bool = False):
        self.name = name
        self.distortion = distortion
        self.dist_is_psnr = dist_is_psnr
        self.meter = RateDistortionMeter()
        self.t0 = time.time()
        self.log = logging.getLogger(name)

    def update(self, loss, dist, rate, n=1):
        self.meter.update(loss, dist, rate, n)

    def epoch(self, epoch: int, lr: float = None) -> str:
        loss, dist, rate = self.meter.avg
        if self.dist_is_psnr:
            quality = f"psnr={dist:7.4f}dB"
        elif self.distortion == "mse":
            p = -10.0 * math.log10(max(dist, 1e-12))
            quality = f"psnr={p:7.4f}dB (mse={dist:.6f})"
        else:
            db = -10.0 * math.log10(max(1.0 - dist, 1e-12))
            quality = f"{self.distortion}={dist:.5f} ({db:.2f}dB)"
        dt = time.time() - self.t0
        lrs = f" lr={lr:.2e}" if lr is not None else ""
        msg = (f"[{self.name}] epoch {epoch}: loss={loss:.6f} "
               f"{quality} bpp={rate:.5f}{lrs} ({dt:.1f}s)")
        self.log.info(msg)
        self.meter.reset()
        self.t0 = time.time()
        return msg

    def state_dict(self):
        return self.meter.state_dict()

    def load_state_dict(self, d):
        self.meter.load_state_dict(d)


def setup_logging(log_dir: str = None, level=logging.INFO):
    """Console + rotating file handlers (utils/config.py:24-47)."""
    import logging.handlers
    import os

    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    logging.getLogger("jax").setLevel(logging.INFO)
    # PIL logs every PNG chunk at DEBUG — thousands of lines per ACL
    # iteration that just rotate away the useful history
    logging.getLogger("PIL").setLevel(logging.INFO)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        ch = logging.StreamHandler()
        ch.setLevel(level)
        ch.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        root.addHandler(ch)
    if log_dir:
        # one experiment's files at a time: drop file handlers from any
        # previous experiment (multi-point drivers like rd_campaign call
        # this once per operating point)
        for h in list(root.handlers):
            if isinstance(h, logging.handlers.RotatingFileHandler):
                root.removeHandler(h)
                h.close()
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            os.path.join(log_dir, "exp_debug.log"),
            maxBytes=10**6, backupCount=5)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        root.addHandler(fh)
        eh = logging.handlers.RotatingFileHandler(
            os.path.join(log_dir, "exp_error.log"),
            maxBytes=10**6, backupCount=5)
        eh.setLevel(logging.WARNING)
        root.addHandler(eh)
