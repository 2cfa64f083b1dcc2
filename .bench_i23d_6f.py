"""i23d at the reference's own protocol (--num_frames 6,
sample_obajverse_i23d_dit.sh:186) — context for the 24-frame number."""
import os, time
import numpy as np
os.environ['LN3DIFF_BENCH_FAMILY'] = 'i23d'
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import bench
pipe, encode = bench._build_family()
import tempfile
cond, uncond = encode('ref protocol')
def run(seed):
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        out = pipe(jax.random.PRNGKey(seed), cond, uncond, batch=1,
                   num_frames=6, mesh_path=os.path.join(td, 'm.obj'),
                   mesh_grid=192, render_resolution=192, video_uint8=True)
        np.asarray(out['video'])
    return time.perf_counter() - t0
run(0)
walls = [run(s) for s in (1, 2, 3)]
print('i23d @6 frames:', [round(w, 2) for w in walls], 'min', round(min(walls), 2))
