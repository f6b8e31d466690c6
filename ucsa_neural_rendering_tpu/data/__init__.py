from .rays import get_rays, get_rays_sampled, nerf_matrix_to_ngp
from .loader import DataLoader, default_collate
from .scannet import ScanNet
from .scannet_ngp import ScanNetNGP
from .scannet_ngp_joint import ScanNetNGPJoint
from .cl_mixers import ScanNetCL, ScanNetCLJoint
from .label_loader import LabelLoaderAuto
from .splits import create_split, load_split, save_split

__all__ = [
    "get_rays", "get_rays_sampled", "nerf_matrix_to_ngp",
    "DataLoader", "default_collate",
    "ScanNet", "ScanNetNGP", "ScanNetNGPJoint", "ScanNetCL", "ScanNetCLJoint",
    "LabelLoaderAuto", "create_split", "load_split", "save_split",
]
