"""G-Objaverse text→3D sampling entry (reference filename parity).

The reference splits sampling into ``vit_triplane_diffusion_sample.py``
(ShapeNet/FFHQ) and ``vit_triplane_diffusion_sample_objaverse.py``
(t23d/i23d with hard-coded prompts at :189-223 and the
``assets/objv_eval_pose.pt`` orbit).  Our implementation is unified in
``vit_triplane_diffusion_sample.py`` (same CLI, orbit cameras generated
by ``ln3diff_tpu.render.camera.orbit_cameras``); this module preserves
the reference entry-point name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from vit_triplane_diffusion_sample import main

if __name__ == '__main__':
    main()
