from .nerf_trainer import (NeRFTrainer, make_nerf_optimizer, nerf_losses)
from .seg_trainer import (SegTrainer, cross_entropy_ignore, make_seg_optimizer,
                          poly_lr_factor)
from .joint_trainer import JointTrainer
from . import (checkpoints, cl_driver, finetune_loop, joint_loop,
               pretrain_loop)

__all__ = [
    "NeRFTrainer", "make_nerf_optimizer", "nerf_losses",
    "SegTrainer", "cross_entropy_ignore", "make_seg_optimizer",
    "poly_lr_factor", "JointTrainer",
    "checkpoints", "cl_driver", "finetune_loop", "joint_loop",
    "pretrain_loop",
]
