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

    TEST-ONLY utility: production resizing happens on the host
    (data/loader.py), whose canvas-overflow path CROPS with a GT clip. The
    per-axis min() clamp here distorts aspect ratio when only one axis
    overflows, and the returned scale is the pre-clamp factor — do not wire
    this into a data path without replacing the clamp with the loader's
    crop semantics.
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
#   GaussianBlur(sigma in [0.1, 2.0]) p=0.5, RandomErasing x3.
#
# Channel-order semantics: the reference reads BGR arrays (d2 default
# INPUT.FORMAT) and wraps them in a PIL image LABELED "RGB"
# (two_crop_augmentation_mapper.py:145) — so every PIL luma/HSV op runs with
# R and B swapped. We reproduce that exactly: the ITU-R 601-2 weights and the
# HSV transform are applied to the channels AS STORED (BGR), not to the true
# colors. Differential oracle: tests/test_strong_aug_torch.py.
# ---------------------------------------------------------------------------

# PIL convert("L") weights applied to channel order as stored (see above)
_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def _blend(a, b, f):
    return a * f + b * (1.0 - f)


def _pil_u8(img):
    """PIL materialises uint8 after every op (ImageEnhance/convert/filter):
    round-half-up + clamp. Keeping this in the pipeline makes the jitter
    distribution identical to the reference's, not merely close."""
    return jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)


def _pil_gray(img):
    """Per-pixel PIL convert('L'): quantized luma of the stored channels."""
    return jnp.floor(img @ _LUMA + 0.5)


def adjust_brightness(img, factor):
    return img * factor


def adjust_contrast(img, factor, true_hw=None):
    # PIL ImageEnhance.Contrast blends against a CONSTANT int(mean(L) + 0.5)
    # of the (quantized) grayscale image. The reference enhances the UNPADDED
    # image, so on a padded canvas the mean must be taken over the content
    # region only, and the blend (which writes mean*(1-f) everywhere) must be
    # masked back to zero outside it — contrast is the one jitter op with a
    # global statistic; the other three are pixel-wise and map 0 -> 0.
    gray = _pil_gray(img)
    if true_hw is None:
        mean = jnp.floor(jnp.mean(gray) + 0.5)
        return _blend(img, mean, factor)
    h, w = img.shape[0], img.shape[1]
    mask = (
        (jnp.arange(h)[:, None] < true_hw[0])
        & (jnp.arange(w)[None, :] < true_hw[1])
    ).astype(img.dtype)
    npix = jnp.maximum(true_hw[0] * true_hw[1], 1).astype(img.dtype)
    mean = jnp.floor(jnp.sum(gray * mask) / npix + 0.5)
    return _blend(img, mean, factor) * mask[..., None]


def adjust_saturation(img, factor):
    # PIL ImageEnhance.Color blends against the quantized L image
    return _blend(img, _pil_gray(img)[..., None], factor)


def adjust_hue(img, delta):
    """HSV hue shift (delta in turns, [-0.5, 0.5]) on the channels AS STORED
    — matching the reference's PIL adjust_hue on its BGR-as-"RGB" image.
    Continuous HSV; PIL's uint8 H-plane adds only quantization-level deltas
    (measured mean ~1.5/255, tests/test_strong_aug_torch.py)."""
    x = img / 255.0
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    c = mx - mn
    cs = jnp.where(c == 0, 1.0, c)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = jnp.where(
        mx == r,
        ((g - b) / cs) % 6.0,
        jnp.where(mx == g, (b - r) / cs + 2.0, (r - g) / cs + 4.0),
    )
    h = jnp.where(c == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, c / jnp.where(mx == 0, 1.0, mx))
    h = (h + delta) % 1.0

    def chan(n):
        k = (n + h * 6.0) % 6.0
        return mx - mx * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1) * 255.0


def color_jitter(rng, img, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
                 true_hw=None):
    """torchvision ColorJitter: all four sub-ops applied in a random
    permutation, each with a uniformly sampled factor, PIL-quantizing after
    each op exactly like the reference's PIL pipeline. `true_hw` (traced
    [h, w]) scopes the contrast mean to the content region of a padded
    canvas (the other ops are pixel-wise and padding-safe)."""
    keys = jax.random.split(rng, 5)
    fb = jax.random.uniform(keys[0], (), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(keys[1], (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(keys[2], (), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(keys[3], (), minval=-hue, maxval=hue)

    def op(i, x):
        y = jax.lax.switch(
            i,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc, true_hw=true_hw),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, fh),
            ],
            x,
        )
        return _pil_u8(y)

    perm = jax.random.permutation(keys[4], 4)
    return jax.lax.fori_loop(0, 4, lambda k, x: op(perm[k], x), img)


def to_grayscale(img):
    # torchvision RandomGrayscale -> PIL convert("L"), replicated to 3
    # channels (quantized, like every PIL op)
    gray = _pil_gray(img)[..., None]
    return jnp.broadcast_to(gray, img.shape)


def gaussian_blur(img, sigma, kernel_size: int = 9, true_hw=None):
    """Depthwise separable gaussian blur (static kernel size, traced sigma),
    renormalized over the valid region.

    Renormalization (divide by the blurred validity mask) removes the
    zero-padding darkening at image borders AND at the content/canvas
    boundary when `true_hw` (traced [h, w]) is given — approximating PIL's
    edge extension, which the reference gets for free because it blurs
    unpadded images. Kernel size 9 truncates the tails at sigma -> 2, but the
    truncation error is at/below Pillow's own box-blur approximation floor
    (both ~0.8/255 mean interior; measured in tests/test_strong_aug_torch.py),
    so a wider kernel buys nothing against the actual reference output."""
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    k = k / jnp.sum(k)
    h, w = img.shape[0], img.shape[1]
    if true_hw is None:
        mask = jnp.ones((h, w), jnp.float32)
    else:
        mask = (
            (jnp.arange(h)[:, None] < true_hw[0])
            & (jnp.arange(w)[None, :] < true_hw[1])
        ).astype(jnp.float32)
    # stack the mask as a 4th "channel" so one separable conv pair blurs both
    src = jnp.concatenate(
        [(img * mask[..., None]).transpose(2, 0, 1), mask[None]], axis=0
    )[:, None]  # [C+1, 1, H, W]
    kw = k.reshape(1, 1, 1, kernel_size)
    kh = k.reshape(1, 1, kernel_size, 1)
    out = jax.lax.conv_general_dilated(src, kw, (1, 1), [(0, 0), (r, r)])
    out = jax.lax.conv_general_dilated(out, kh, (1, 1), [(r, r), (0, 0)])
    out = out[:, 0].transpose(1, 2, 0)  # [H, W, C+1]
    blurred = out[..., :-1] / jnp.maximum(out[..., -1:], 1e-6)
    # padding outside the valid region stays untouched
    return jnp.where(mask[..., None] > 0, blurred, img)


def random_erasing(rng, img, scale=(0.05, 0.2), ratio=(0.3, 3.3), value="random",
                   noise=None, true_hw=None):
    """torchvision RandomErasing geometry, exactly: up to 10 attempts of
    (area ~ U(scale)*image_area, aspect ~ exp(U(log ratio))), sides rounded,
    an attempt is valid iff h < H and w < W (strict), the first valid attempt
    wins, and NO erase happens when all 10 fail. Offsets are uniform over
    [0, H-h] x [0, W-w]. `true_hw` (traced [h, w]) scopes everything to the
    valid image region — the reference erases within the unpadded image.

    `noise`: optional precomputed [H, W, C] fill — callers applying several
    erasings to one image pass ONE sample for all of them (the fill is iid,
    so reusing the sample only means an overlap region keeps the first
    rectangle's values instead of being resampled — marginally identical,
    and it saves a full-canvas sample per extra call, a measurable slice of
    the strong-aug cost at 608x1216; BENCH_NOTES round 3)."""
    h, w = img.shape[0], img.shape[1]
    if true_hw is None:
        th = jnp.asarray(h, jnp.int32)
        tw = jnp.asarray(w, jnp.int32)
    else:
        th, tw = true_hw[0], true_hw[1]
    keys = jax.random.split(rng, 5)
    area = (th * tw).astype(jnp.float32)
    target = jax.random.uniform(keys[0], (10,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        keys[1], (10,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    ehs = jnp.floor(jnp.sqrt(target * aspect) + 0.5).astype(jnp.int32)
    ews = jnp.floor(jnp.sqrt(target / aspect) + 0.5).astype(jnp.int32)
    ok = (ehs < th) & (ews < tw)
    found = jnp.any(ok)
    first = jnp.argmax(ok)
    eh, ew = ehs[first], ews[first]
    # torch.randint(0, n): floor(U[0,1) * n) is the same uniform integer law
    y0 = jnp.floor(jax.random.uniform(keys[2], ()) * (th - eh + 1)).astype(jnp.int32)
    x0 = jnp.floor(jax.random.uniform(keys[3], ()) * (tw - ew + 1)).astype(jnp.int32)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = (
        found & (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
    )[..., None]
    if noise is None:
        noise = _erasing_fill(keys[4], img.shape)
    return jnp.where(mask, noise, img)


def _erasing_fill(rng, shape):
    """The reference's ACTUAL erasing fill: RandomErasing writes N(0,1) on the
    ToTensor [0,1] scale, then ToPILImage does `.mul(255).byte()` — a
    truncation toward zero + uint8 WRAP (measured: torch casts -433.5 -> 79).
    The training distribution is therefore near-uniform over [0,255], not a
    clamped gaussian; jnp.mod(trunc(n*255), 256) reproduces it exactly."""
    n = jax.random.normal(rng, shape) * 255.0
    return jnp.mod(jnp.trunc(n), 256.0)


# the reference's three RandomErasing calls use three different
# scale/ratio settings (detection_utils.py:22-31)
_ERASE_PARAMS = (
    (0.7, (0.05, 0.2), (0.3, 3.3)),
    (0.5, (0.02, 0.2), (0.1, 6.0)),
    (0.3, (0.02, 0.2), (0.05, 8.0)),
)


def strong_augment(rng, img, true_hw=None):
    """The reference's full strong pipeline (detection_utils.py:7-37 +
    transforms/augmentations.py:6-21): ColorJitter p=0.8, Grayscale p=0.2,
    GaussianBlur(sigma~U[0.1,2]) p=0.5, then three RandomErasing calls with
    p=(0.7, 0.5, 0.3) and per-call scale/ratio. `true_hw`: traced [h, w] of
    the valid canvas region — scopes blur renormalization and erasing
    geometry to the image content like the reference's unpadded pipeline."""
    keys = jax.random.split(rng, 12)
    do_jit = jax.random.bernoulli(keys[0], 0.8)
    jittered = color_jitter(keys[1], img, true_hw=true_hw)
    img = jnp.where(do_jit, jittered, img)

    do_gray = jax.random.bernoulli(keys[2], 0.2)
    img = jnp.where(do_gray, to_grayscale(img), img)

    do_blur = jax.random.bernoulli(keys[3], 0.5)
    sigma = jax.random.uniform(keys[4], (), minval=0.1, maxval=2.0)
    img = jnp.where(do_blur, gaussian_blur(img, sigma, true_hw=true_hw), img)

    # one iid fill canvas shared by the three erasings (see random_erasing);
    # keys[11] is used ONLY here — the rectangle-geometry keys 8..10 stay
    # independent of the fill values (no key reuse)
    noise = _erasing_fill(keys[11], img.shape)
    for i, (p, scale, ratio) in enumerate(_ERASE_PARAMS):
        do = jax.random.bernoulli(keys[5 + i], p)
        erased = random_erasing(
            keys[8 + i], img, scale=scale, ratio=ratio, noise=noise, true_hw=true_hw
        )
        img = jnp.where(do, erased, img)
    return img


strong_augment_batch = jax.jit(jax.vmap(strong_augment))
