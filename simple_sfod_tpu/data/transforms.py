"""On-device, jit-compiled image augmentation.

The reference runs augmentation on CPU workers with torchvision/cv2
(mappers/two_crop_augmentation_mapper.py:92-157, data/detection_utils.py:7-37):
weak = resize + random flip; strong = ColorJitter + RandomGrayscale +
GaussianBlur + 3x RandomErasing on the *same* geometry. Because the strong
view is a pure pixel function of the weak view, on TPU we transfer only the
weak batch and derive the strong view *inside the compiled train step* —
augmentation rides the MXU/VPU instead of the host.

All functions take explicit PRNG keys and are batched with vmap. Images are
float [H, W, 3] in 0..255, channel order irrelevant except hue.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Geometry (weak augmentation)
# ---------------------------------------------------------------------------


def resize_to_canvas(
    image: jnp.ndarray, canvas_hw: Tuple[int, int], min_size: int, max_size: int = 1333
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shortest-edge resize onto a fixed canvas (static shapes).

    Returns (canvas [Hc, Wc, 3], new_size [2] int32, scale_xy [2] float32).
    New dims follow detectron2's ResizeShortestEdge.get_output_shape exactly
    (shorter edge pinned to min_size, longer capped at max_size, int(x+0.5)
    rounding); the resized image is placed top-left on a zero canvas.
    """
    from .loader import d2_output_shape

    h, w = image.shape[0], image.shape[1]
    nh, nw = d2_output_shape(h, w, min_size, max_size)
    ch, cw = canvas_hw
    nh, nw = min(nh, ch), min(nw, cw)
    resized = jax.image.resize(image, (nh, nw, image.shape[2]), method="bilinear")
    canvas = jnp.zeros((ch, cw, image.shape[2]), image.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
    return (
        canvas,
        jnp.asarray([nh, nw], jnp.int32),
        jnp.asarray([nw / w, nh / h], jnp.float32),
    )


def hflip(image: jnp.ndarray, boxes: jnp.ndarray, true_wh: jnp.ndarray):
    """Horizontal flip of the *valid region* of the canvas.

    true_wh: (w,) scalar width of valid pixels. Flipping is expressed as a
    roll-after-reverse so padding stays on the right.
    """
    w = true_wh
    flipped = image[:, ::-1, :]
    # after reversal the valid region sits at the right edge; roll it back
    flipped = jnp.roll(flipped, w - image.shape[1], axis=1)
    new_boxes = jnp.stack(
        [w - boxes[..., 2], boxes[..., 1], w - boxes[..., 0], boxes[..., 3]], axis=-1
    )
    return flipped, new_boxes


def random_hflip(rng, image, boxes, true_wh, prob: float = 0.5):
    do = jax.random.bernoulli(rng, prob)
    fi, fb = hflip(image, boxes, true_wh)
    return (
        jnp.where(do, fi, image),
        jnp.where(do, fb, boxes),
        do,
    )


# ---------------------------------------------------------------------------
# Photometric (strong augmentation) — reference detection_utils.py:7-37:
#   ColorJitter(0.4, 0.4, 0.4, 0.1) p=0.8, RandomGrayscale p=0.2,
#   GaussianBlur(sigma in [0.1, 2.0]) p=0.5, RandomErasing x3
# ---------------------------------------------------------------------------

_LUMA = jnp.asarray([0.114, 0.587, 0.299])  # BGR order (reference uses BGR input)


def _blend(a, b, f):
    return a * f + b * (1.0 - f)


def adjust_brightness(img, factor):
    return img * factor


def adjust_contrast(img, factor):
    mean = jnp.mean(img @ _LUMA)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    gray = (img @ _LUMA)[..., None]
    return _blend(img, gray, factor)


def adjust_hue(img, delta):
    """Hue rotation in YIQ space (delta in turns, [-0.5, 0.5]); equivalent to
    torchvision's HSV hue shift up to float precision."""
    # img is BGR; build RGB for the standard YIQ transform
    rgb = img[..., ::-1] / 255.0
    yiq = jnp.einsum(
        "...c,dc->...d",
        rgb,
        jnp.asarray(
            [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]]
        ),
    )
    angle = 2.0 * jnp.pi * delta
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    y = yiq[..., 0]
    i = yiq[..., 1] * cos - yiq[..., 2] * sin
    q = yiq[..., 1] * sin + yiq[..., 2] * cos
    rgb2 = jnp.einsum(
        "...d,cd->...c",
        jnp.stack([y, i, q], -1),
        jnp.asarray(
            [[1.0, 0.956, 0.619], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]]
        ),
    )
    return jnp.clip(rgb2[..., ::-1], 0.0, 1.0) * 255.0


def color_jitter(rng, img, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1):
    """torchvision ColorJitter: each sub-op applied in random order with a
    uniformly sampled factor. Order randomisation approximated by a random
    permutation of the four ops (as torchvision does)."""
    keys = jax.random.split(rng, 5)
    fb = jax.random.uniform(keys[0], (), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(keys[1], (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(keys[2], (), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(keys[3], (), minval=-hue, maxval=hue)

    def op(i, x):
        return jax.lax.switch(
            i,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, fh),
            ],
            x,
        )

    perm = jax.random.permutation(keys[4], 4)
    img = jax.lax.fori_loop(0, 4, lambda k, x: op(perm[k], x), img)
    return jnp.clip(img, 0.0, 255.0)


def to_grayscale(img):
    gray = (img @ _LUMA)[..., None]
    return jnp.broadcast_to(gray, img.shape)


def gaussian_blur(img, sigma, kernel_size: int = 9):
    """Depthwise separable gaussian blur (static kernel size, traced sigma)."""
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    k = k / jnp.sum(k)
    # separable: blur width then height, via conv on each channel
    img_t = img.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    kw = k.reshape(1, 1, 1, kernel_size)
    kh = k.reshape(1, 1, kernel_size, 1)
    out = jax.lax.conv_general_dilated(img_t, kw, (1, 1), [(0, 0), (r, r)])
    out = jax.lax.conv_general_dilated(out, kh, (1, 1), [(r, r), (0, 0)])
    return out[:, 0].transpose(1, 2, 0)


def random_erasing(rng, img, scale=(0.05, 0.2), ratio=(0.3, 3.3), value="random",
                   noise=None):
    """torchvision RandomErasing(p=0.7/0.5/0.3 applied thrice in the
    reference); one call = one potential rectangle filled with noise.

    `noise`: optional precomputed [H, W, C] fill — callers applying several
    erasings to one image pass ONE sample for all of them (the fill is iid,
    so reusing the sample only means an overlap region keeps the first
    rectangle's values instead of being resampled — marginally identical,
    and it saves a full-canvas normal sample per extra call, a measurable
    slice of the strong-aug cost at 608x1216; BENCH_NOTES round 3)."""
    h, w = img.shape[0], img.shape[1]
    keys = jax.random.split(rng, 5)
    area = h * w
    target = jax.random.uniform(keys[0], (), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        keys[1], (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(target * aspect), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(target / aspect), 1, w - 1).astype(jnp.int32)
    y0 = jax.random.randint(keys[2], (), 0, h - eh)
    x0 = jax.random.randint(keys[3], (), 0, w - ew)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = ((rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew))[..., None]
    if noise is None:
        noise = jax.random.normal(keys[4], img.shape) * 255.0
    return jnp.where(mask, noise, img)


def strong_augment(rng, img):
    """The reference's full strong pipeline (detection_utils.py:7-37 +
    transforms/augmentations.py:6-21): ColorJitter p=0.8, Grayscale p=0.2,
    GaussianBlur(sigma~U[0.1,2]) p=0.5, RandomErasing p=(0.7, 0.5, 0.3)."""
    keys = jax.random.split(rng, 12)
    do_jit = jax.random.bernoulli(keys[0], 0.8)
    jittered = color_jitter(keys[1], img)
    img = jnp.where(do_jit, jittered, img)

    do_gray = jax.random.bernoulli(keys[2], 0.2)
    img = jnp.where(do_gray, to_grayscale(img), img)

    do_blur = jax.random.bernoulli(keys[3], 0.5)
    sigma = jax.random.uniform(keys[4], (), minval=0.1, maxval=2.0)
    img = jnp.where(do_blur, gaussian_blur(img, sigma), img)

    # one iid noise canvas shared by the three erasings (see random_erasing);
    # keys[11] is used ONLY here — the rectangle-geometry keys 8..10 stay
    # independent of the fill values (no key reuse)
    noise = jax.random.normal(keys[11], img.shape) * 255.0
    for i, p in enumerate((0.7, 0.5, 0.3)):
        do = jax.random.bernoulli(keys[5 + i], p)
        erased = random_erasing(keys[8 + i], img, noise=noise)
        img = jnp.where(do, erased, img)
    return img


strong_augment_batch = jax.jit(jax.vmap(strong_augment))
