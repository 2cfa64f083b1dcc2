"""In-training diffusion diagnostics: noise-schedule render strips.

Mirrors reference ``render_video_noise_schedule``
(``nsr/train_util_diffusion.py``) and the noised/denoised triptychs
(``sgm_DiffusionEngine.py:254-383``): visualize what the volume renderer
sees at several diffusion times — q-noised latents decoded and rendered
side by side with the clean render, so latent-scale mismatches and
schedule problems are visible at a glance.
"""

from __future__ import annotations

import numpy as np


def render_noise_schedule_strip(latent, camera25, diffusion, decode_fn,
                                render_fn, key=None,
                                ts=(0.0, 0.25, 0.5, 0.75, 1.0)):
    """Render decoded q(x_t | x_0) latents at several t.

    Args:
      latent: (1, h, w, C) clean VAE latent.
      diffusion: GaussianDiffusion (q_sample over its schedule).
      decode_fn: latent → planes; render_fn: (planes, cam25) → image.
    Returns:
      (len(ts), H, W, 3) float array in [-1, 1], t ascending.
    """
    import jax
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    frames = []
    noise = jax.random.normal(key, latent.shape)
    for frac in ts:
        t = jnp.full((latent.shape[0],),
                     int(frac * (diffusion.num_timesteps - 1)), jnp.int32)
        x_t = diffusion.q_sample(latent, t, noise)
        planes = decode_fn(x_t)
        frames.append(np.asarray(render_fn(planes, camera25))[0])
    return np.stack(frames)


def save_image_strip(frames: np.ndarray, path: str):
    """Concatenate (N, H, W, 3) [-1,1] frames horizontally → one PNG."""
    from PIL import Image
    strip = np.concatenate(list(frames), axis=1)
    img = ((np.clip(strip, -1, 1) + 1) * 127.5).astype(np.uint8)
    Image.fromarray(img).save(path)
    return path
