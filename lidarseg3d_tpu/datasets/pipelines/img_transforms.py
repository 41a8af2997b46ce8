"""Image transforms co-applied to points_cp projections and pixel labels.

Host-side numpy/cv2 re-implementations of
/root/reference/det3d/datasets/pipelines/img_transforms.py (resize, random
horizontal flip, color jitter, jpeg compression, random rescale, random
crop), all keeping point-to-pixel coordinates and sparse pixel labels
consistent. points_cp rows are [cam_id, w_coord, h_coord].
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def resize_image_points_label(image, points_cp, image_label, resized_shape):
    """resized_shape: (W, H) cv2 convention."""
    H0, W0 = image.shape[:2]
    W1, H1 = resized_shape
    img = cv2.resize(image, (W1, H1), interpolation=cv2.INTER_LINEAR)
    if points_cp is not None and len(points_cp):
        points_cp = points_cp.copy()
        points_cp[:, 1] *= W1 / W0
        points_cp[:, 2] *= H1 / H0
    if image_label is not None:
        image_label = cv2.resize(
            image_label, (W1, H1), interpolation=cv2.INTER_NEAREST
        )
    return img, points_cp, image_label


def random_horizontal_flip(image, points_cp_w, image_label, rng,
                           probability=0.5):
    """Flips image width axis; points_cp_w are the w coords of this cam."""
    if rng.random() < probability:
        W = image.shape[1]
        image = image[:, ::-1].copy()
        points_cp_w = W - 1 - points_cp_w
        if image_label is not None:
            image_label = image_label[:, ::-1].copy()
    return image, points_cp_w, image_label


def color_jitter(image, rng, brightness=0.3, contrast=0.3, saturation=0.3,
                 hue=0.1):
    """torchvision-style ColorJitter on a BGR uint8 image."""
    img = image.astype(np.float32)
    if brightness:
        img *= rng.uniform(max(0, 1 - brightness), 1 + brightness)
    if contrast:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        # torchvision uses the grayscale mean
        gray = (0.114 * img[..., 0] + 0.587 * img[..., 1]
                + 0.299 * img[..., 2]).mean()
        img = f * img + (1 - f) * gray
    img = np.clip(img, 0, 255).astype(np.uint8)
    if saturation or hue:
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
        if saturation:
            hsv[..., 1] *= rng.uniform(max(0, 1 - saturation), 1 + saturation)
        if hue:
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue) * 180) % 180
        hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
    return img


def jpeg_compression(image, rng, quality_noise=(30, 70), probability=0.5):
    if rng.random() < probability:
        q = int(rng.uniform(quality_noise[0], quality_noise[1]))
        ok, enc = cv2.imencode(".jpg", image, [cv2.IMWRITE_JPEG_QUALITY, q])
        if ok:
            image = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    return image


def random_rescale(image, points_cp, image_label, rng, scale_noise=(1.0, 1.5),
                   probability=0.5):
    if rng.random() < probability:
        s = rng.uniform(scale_noise[0], scale_noise[1])
        H0, W0 = image.shape[:2]
        image, points_cp, image_label = resize_image_points_label(
            image, points_cp, image_label, (int(W0 * s), int(H0 * s))
        )
    return image, points_cp, image_label


def random_crop(image, points_cp, image_label, rng, crop_shape=(320, 1024)):
    """crop_shape: (H, W). Points falling outside get cam_id = -1."""
    H0, W0 = image.shape[:2]
    ch, cw = min(crop_shape[0], H0), min(crop_shape[1], W0)
    y0 = rng.integers(0, H0 - ch + 1)
    x0 = rng.integers(0, W0 - cw + 1)
    image = image[y0:y0 + ch, x0:x0 + cw]
    if image_label is not None:
        image_label = image_label[y0:y0 + ch, x0:x0 + cw]
    if points_cp is not None and len(points_cp):
        points_cp = points_cp.copy()
        points_cp[:, 1] -= x0
        points_cp[:, 2] -= y0
        inside = (
            (points_cp[:, 1] >= 0) & (points_cp[:, 1] <= cw - 1)
            & (points_cp[:, 2] >= 0) & (points_cp[:, 2] <= ch - 1)
        )
        points_cp[~inside, 0] = -1
    return image, points_cp, image_label


def normalize_image(image, mean, std):
    """BGR uint8 -> float32 normalized by per-channel mean/std (0-1 scale)."""
    img = image.astype(np.float32) / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def normalize_image_into(image, mean, std, out):
    """normalize_image, written straight into a preallocated fp32 slot.

    (img/255 - mean)/std == img * (1/(255 std)) - mean/std, done as TWO
    in-place passes over `out` with no temporaries. On a 1-vCPU host the
    naive form costs 4 full-image passes plus an np.stack copy of the
    whole camera block — measured 289 ms/frame for 6x 640x960 cameras in
    the stack alone (tools/bench/mb_loader_stages.py)."""
    scale = 1.0 / (255.0 * np.asarray(std, np.float32))
    bias = np.asarray(mean, np.float32) / np.asarray(std, np.float32)
    np.multiply(image, scale, out=out, casting="unsafe")
    np.subtract(out, bias, out=out)
    return out
