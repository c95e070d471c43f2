"""ReduceLROnPlateau, host-side (matches torch's semantics as configured at
agents/blkbsdimgcomp_agent.py:52-54 and re-created per ACL iteration at
agent:219-222: mode='min', factor=0.8, patience=4, threshold=3e-4 rel,
cooldown=1, min_lr=4e-5 (2e-5 in cl_loss mode)). State is a plain dict so
it checkpoints trivially."""

import dataclasses


@dataclasses.dataclass
class ReduceLROnPlateau:
    factor: float = 0.8
    patience: int = 4
    min_lr: float = 4e-5
    threshold: float = 3e-4  # relative mode (agent:220)
    cooldown: int = 1
    best: float = float("inf")
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed one validation metric; returns the (possibly reduced) LR."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            self.cooldown_counter = self.cooldown
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self):
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, d):
        # checkpoints numpy-ify scalars (checkpoint.py _to_host)
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d.get("cooldown_counter", 0))
