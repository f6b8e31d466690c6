"""Image/label augmentation as pure JAX functions.

Equivalent of the reference's torchvision augmentation stacks
(ref: nr4seg/dataset/helper.py:22-232 and the on-GPU `data_aug` at
nr4seg/lightning/joint_train_lightning_net.py:259-302): ColorJitter
(brightness/contrast/saturation 0.3, hue 0.05, applied in random order like
torchvision), ±degrees rotation (bilinear image / nearest label, fill 0),
random crop to the output size, horizontal flip p=0.5, and a final center
crop.

TPU-first design: one functional `augment(key, img, labels, ...)` with
explicit PRNG keys and static shapes — the same code jit-compiles inside the
joint train step (the reference does this augmentation on GPU tensors) and
runs on host CPU inside datasets. Variable-size inputs are rescaled to the
canonical size host-side first (see `rescale_to_canonical`), mirroring the
reference's conditional `interpolate` (helper.py:158-187).

Label convention: labels enter SHIFTED +1 (0 = unknown) so rotation fill 0
means unknown, and are shifted back by the caller — the reference's exact
trick (joint_train_lightning_net.py:262-299).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# numpy, NOT jnp: a module-level device array would initialize the jax
# backend at import time — on axon-TPU hosts that can block on the remote
# chip service, hanging even `scripts/*.py --help`. jnp ops promote it.
_GRAY = np.array([0.299, 0.587, 0.114], np.float32)


def _blend(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def _adjust_brightness(key, img, strength):
    f = jax.random.uniform(key, (), minval=1 - strength, maxval=1 + strength)
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(key, img, strength):
    f = jax.random.uniform(key, (), minval=1 - strength, maxval=1 + strength)
    mean = jnp.mean(img @ _GRAY)
    return _blend(img, mean, f)


def _adjust_saturation(key, img, strength):
    f = jax.random.uniform(key, (), minval=1 - strength, maxval=1 + strength)
    gray = (img @ _GRAY)[..., None]
    return _blend(img, gray, f)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(key, img, strength):
    shift = jax.random.uniform(key, (), minval=-strength, maxval=strength)
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return _hsv_to_rgb(hsv)


def color_jitter(key, img, brightness=0.3, contrast=0.3, saturation=0.3,
                 hue=0.05):
    """torchvision ColorJitter semantics incl. random op order. img HWC."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    perm = jax.random.permutation(k_perm, 4)
    fns = [
        partial(_adjust_brightness, k_b, strength=brightness),
        partial(_adjust_contrast, k_c, strength=contrast),
        partial(_adjust_saturation, k_s, strength=saturation),
        partial(_adjust_hue, k_h, strength=hue),
    ]
    for slot in range(4):
        img = jax.lax.switch(perm[slot], fns, img)
    return img


def _rotate(img, angle_deg, order: int, fill=0.0):
    """Rotate HWC (or HW) around the image center; order 1 bilinear /
    0 nearest; out-of-bounds → fill (torchvision F.rotate semantics)."""
    hw = img.shape[:2]
    h, w = hw
    theta = -angle_deg * jnp.pi / 180.0  # inverse map
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ys = cos * (yy - cy) - sin * (xx - cx) + cy
    xs = sin * (yy - cy) + cos * (xx - cx) + cx

    def sample(channel):
        if order == 0:
            yi = jnp.round(ys).astype(jnp.int32)
            xi = jnp.round(xs).astype(jnp.int32)
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            vals = channel[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            return jnp.where(inb, vals, fill)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        wy = ys - y0
        wx = xs - x0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                vals = jnp.where(
                    inb, channel[jnp.clip(yi, 0, h - 1),
                                 jnp.clip(xi, 0, w - 1)], fill)
                wgt = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
                out = out + wgt * vals
        return out

    if img.ndim == 2:
        return sample(img)
    return jnp.stack([sample(img[..., c]) for c in range(img.shape[-1])],
                     axis=-1)


def _crop(x, i, j, out_hw):
    if x.ndim == 2:
        return jax.lax.dynamic_slice(x, (i, j), out_hw)
    return jax.lax.dynamic_slice(x, (i, j, 0), (*out_hw, x.shape[-1]))


def augment(key, img, labels, out_hw=(240, 320), degrees=10.0, flip_p=0.5,
            jitter_bcsh=(0.3, 0.3, 0.3, 0.05), only_crop=False):
    """img: [H, W, 3] float in [0,1]; labels: list of [H, W] float maps
    ALREADY shifted +1 (0 = unknown). H,W must be >= out_hw (rescale first).

    Returns (img [outH, outW, 3], labels list [outH, outW]).
    only_crop=True → center crop only (val/test path, helper.py:188,227).
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    assert h >= oh and w >= ow, "rescale_to_canonical before augment"

    if not only_crop:
        k_jit, k_rot, k_ci, k_cj, k_flip = jax.random.split(key, 5)
        img = color_jitter(k_jit, img, *jitter_bcsh)
        angle = jax.random.uniform(k_rot, (), minval=-degrees, maxval=degrees)
        img = _rotate(img, angle, order=1)
        labels = [_rotate(l, angle, order=0) for l in labels]
        i = jax.random.randint(k_ci, (), 0, h - oh + 1)
        j = jax.random.randint(k_cj, (), 0, w - ow + 1)
        img = _crop(img, i, j, out_hw)
        labels = [_crop(l, i, j, out_hw) for l in labels]
        do_flip = jax.random.uniform(k_flip, ()) < flip_p
        img = jnp.where(do_flip, img[:, ::-1, :], img)
        labels = [jnp.where(do_flip, l[:, ::-1], l) for l in labels]
    else:
        # center crop straight to output size
        i, j = (h - oh) // 2, (w - ow) // 2
        img = _crop(img, i, j, out_hw)
        labels = [_crop(l, i, j, out_hw) for l in labels]
    return img, labels


# Cached-jit entry for EAGER (host dataset) callers. Calling `augment`
# eagerly re-traces its four `lax.switch` branches per call (the partial
# closures are fresh objects), compiling ~4 new executables per image —
# XLA:CPU JIT code pages are mmapped and never unmapped, so a long pretrain
# run leaks memory maps until it segfaults at vm.max_map_count (~65k; found
# round 3 via scripts/exp_synthetic_cl.py 40-epoch runs). Under jit the
# branches trace once per (shape, config) signature. In-jit callers
# (joint_trainer) keep using `augment` directly.
augment_jit = jax.jit(augment, static_argnames=(
    "out_hw", "degrees", "flip_p", "jitter_bcsh", "only_crop"))


def rescale_to_canonical(img: np.ndarray, labels: list, out_hw=(240, 320)):
    """Host-side conditional rescale matching helper.py:158-187: upscale by
    max(outH/H, outW/W)*1.2 when the image is smaller than the output, or
    downscale by the same rule when H >= 2*outH. img HWC float, labels HW."""
    import cv2
    h, w = img.shape[:2]
    oh, ow = out_hw
    scale = None
    if h >= 2 * oh or h < oh or w < ow:
        scale = max(oh / h, ow / w) * 1.2
    if scale is not None:
        # torch interpolate(scale_factor=sf, recompute_scale_factor=False)
        # FLOORS the output size — round() would grow the canvas by 1px on
        # most real inputs and shift the random-crop offset distribution
        nh, nw = int(h * scale), int(w * scale)
        nh, nw = max(nh, oh), max(nw, ow)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        labels = [cv2.resize(l.astype(np.float32), (nw, nh),
                             interpolation=cv2.INTER_NEAREST) for l in labels]
    return img, labels
