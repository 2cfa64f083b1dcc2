"""EG3D dataset: zip-archive reading path."""

import io
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.data.eg3d import ImageFolderDataset


def test_zip_archive_roundtrip(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    zpath = tmp_path / 'faces.zip'
    labels = []
    with zipfile.ZipFile(zpath, 'w') as z:
        for i in range(2):
            fname = f'img{i:04d}.png'
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                         dtype=np.uint8)).save(buf, 'PNG')
            z.writestr(fname, buf.getvalue())
            labels.append([fname, list(np.full(25, 0.5))])
        z.writestr('dataset.json', json.dumps({'labels': labels}))

    ds = ImageFolderDataset(str(zpath))
    assert len(ds) == 2
    s = ds[1]
    assert s['img'].shape == (16, 16, 3)
    np.testing.assert_allclose(s['c'], 0.5)
