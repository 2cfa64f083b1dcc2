"""misc utils + directory dataset round-trip."""

import numpy as np
import pytest

from ln3diff_tpu.data.lmdb_reader import (DirectoryDataset, compress_array,
                                          decompress_array, load_data)
from ln3diff_tpu.utils.misc import (EasyDict, InfiniteSampler, assert_shape,
                                    construct_class_by_name)


class TestMisc:

    def test_easydict(self):
        d = EasyDict(a=1)
        d.b = 2
        assert d.a == 1 and d['b'] == 2
        with pytest.raises(AttributeError):
            d.missing

    def test_construct_class_by_name(self):
        od = construct_class_by_name('collections.OrderedDict',
                                     [('x', 1)])
        assert od['x'] == 1

    def test_assert_shape(self):
        x = np.zeros((2, 3, 4))
        assert_shape(x, (2, None, 4))
        with pytest.raises(AssertionError):
            assert_shape(x, (2, 3, 5))

    def test_infinite_sampler_sharding(self):
        s0 = list(__import__('itertools').islice(
            iter(InfiniteSampler(10, rank=0, num_replicas=2, shuffle=False)),
            5))
        s1 = list(__import__('itertools').islice(
            iter(InfiniteSampler(10, rank=1, num_replicas=2, shuffle=False)),
            5))
        assert set(s0).isdisjoint(set()) and s0 != s1


class TestCompression:

    def test_gzip_roundtrip(self):
        arr = np.random.default_rng(0).standard_normal((8, 8, 3)).astype(
            np.float32)
        data = compress_array(arr, 'gzip')
        out = decompress_array(data, 'gzip')
        np.testing.assert_array_equal(arr, out)


class TestDirectoryDataset:

    def test_roundtrip_and_loader(self, tmp_path):
        samples = [{'raw_img': np.full((4, 4, 3), i, np.uint8),
                    'c': np.arange(25, dtype=np.float32) + i}
                   for i in range(5)]
        DirectoryDataset.write(str(tmp_path), iter(samples))
        ds = DirectoryDataset(str(tmp_path))
        assert len(ds) == 5
        np.testing.assert_array_equal(ds[3]['raw_img'],
                                      np.full((4, 4, 3), 3))
        it = load_data(ds, batch_size=2, seed=0)
        b = next(it)
        assert b['raw_img'].shape == (2, 4, 4, 3)
        assert b['c'].shape == (2, 25)
