"""Experiment logging.

The reference logs scalars/images to WandB (with Neptune/TensorBoard
fallbacks, ref: nr4seg/utils/get_logger.py:17-52). wandb is not available in
this environment, so the primary sink is a CSV/JSONL logger plus optional
TensorBoard; a wandb sink is attached automatically when importable.
"""

import json
import os
import time


class MetricsLogger:
    """Scalar logger: JSONL on disk + optional TensorBoard + optional wandb."""

    def __init__(self, save_dir: str, project_name: str = "",
                 use_tensorboard: bool = False, exp_config: dict | None = None):
        os.makedirs(save_dir, exist_ok=True)
        self.save_dir = save_dir
        self._jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        self._step = 0
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(save_dir, "tb"))
            except Exception:
                self._tb = None
        try:
            import wandb
            self._wandb = wandb.init(project=project_name or "ucsa-nr-tpu",
                                     dir=save_dir, config=exp_config or {})
        except Exception:
            self._wandb = None
        self._img_seq = {}  # per-tag monotonic index for image filenames
        if exp_config:
            with open(os.path.join(save_dir, "hparams.json"), "w") as f:
                json.dump(exp_config, f, indent=2, default=str)

    def log(self, metrics: dict, step: int | None = None):
        if step is None:
            step = self._step
            self._step += 1
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, tag: str, image, step: int | None = None):
        """Log one HWC uint8 image: PNG under save_dir/images (always) +
        wandb/TB when attached (the reference pushes every Visualizer plot to
        its experiment logger, ref visualizer.py:60-81). The filename carries
        a per-tag monotonic index — `step` defaults to the scalar step, which
        does not advance on image logs, so repeated image logs of one tag
        would otherwise silently overwrite each other."""
        import numpy as np
        image = np.asarray(image)
        if step is None:
            step = self._step
        seq = self._img_seq.get(tag, 0)
        self._img_seq[tag] = seq + 1
        safe = tag.replace("/", "_")
        d = os.path.join(self.save_dir, "images")
        os.makedirs(d, exist_ok=True)
        try:
            import imageio.v2 as imageio
            imageio.imwrite(
                os.path.join(d, f"{safe}_step_{step}_{seq:04d}.png"), image)
        except Exception:
            pass
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")
        if self._wandb is not None:
            import wandb
            self._wandb.log({tag: wandb.Image(image)}, step=step)

    def log_hyperparams(self, hparams: dict):
        with open(os.path.join(self.save_dir, "hparams_flat.json"), "w") as f:
            json.dump(hparams, f, indent=2, default=str)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def get_logger(exp: dict, env: dict, project_name: str, save_dir: str):
    """Reference-compatible factory (ref: nr4seg/utils/get_logger.py:35-43)."""
    from ..config import flatten_dict
    return MetricsLogger(save_dir, project_name=project_name,
                         exp_config=flatten_dict({"exp": exp, "env": env}))
