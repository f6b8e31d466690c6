from .aabb import near_far_from_aabb
from .sampling import stratified_samples, sample_pdf
from .compositing import composite_weights, composite

__all__ = [
    "near_far_from_aabb", "stratified_samples", "sample_pdf",
    "composite_weights", "composite"
]
