"""Driver-facing bench.py glue, tested WITHOUT a chip: family spec
table, env-var plumbing, result ranking and partial formatting.  The
bench is the round artifact the driver parses — regressions here cost a
whole round's number (BENCH_r02/r03 history), so the host-side logic
gets CI coverage even though the measurement itself needs hardware."""

import importlib
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


@pytest.fixture()
def bench_mod(monkeypatch):
    monkeypatch.delenv('LN3DIFF_BENCH_FAMILY', raising=False)
    monkeypatch.delenv('LN3DIFF_BENCH_SAMPLER', raising=False)
    import bench
    importlib.reload(bench)
    yield bench
    monkeypatch.delenv('LN3DIFF_BENCH_FAMILY', raising=False)
    importlib.reload(bench)


class TestFamilySpecs:

    def test_default_family_is_t23d(self, bench_mod):
        assert bench_mod.FAMILY == 't23d'
        assert bench_mod.SPEC['metric'] == 'text_to_mesh_wall_clock'
        assert (bench_mod.NUM_FRAMES, bench_mod.RENDER_RES,
                bench_mod.MESH_GRID, bench_mod.DDIM_STEPS) == \
            (24, 192, 192, 250)

    def test_specs_well_formed(self, bench_mod):
        for name, spec in bench_mod.FAMILY_SPECS.items():
            assert spec['phases'][0].endswith('_encode')
            assert spec['phases'][-1] == 'render'
            assert ('mesh' in spec['phases']) == bool(spec['mesh_grid'])
            assert spec['steps'] == 250       # every release samples 250

    def test_apply_family_sets_env_for_children(self, bench_mod):
        bench_mod._apply_family('shapenet')
        assert os.environ['LN3DIFF_BENCH_FAMILY'] == 'shapenet'
        assert bench_mod.RENDER_RES == 64 and bench_mod.MESH_GRID == 192
        assert 'unet_sample' in bench_mod.PHASE_NAMES

    def test_dpm25_override_only_for_t23d(self, bench_mod, monkeypatch):
        monkeypatch.setenv('LN3DIFF_BENCH_SAMPLER', 'dpm25')
        bench_mod._apply_family('t23d')
        assert bench_mod.DDIM_STEPS == 25
        assert bench_mod.SPEC['metric'] == 'text_to_mesh_wall_clock_dpm25'
        assert 'DPM-Solver++' in bench_mod.SPEC['desc']
        bench_mod._apply_family('shapenet')
        assert bench_mod.DDIM_STEPS == 250

    def test_orbit_cams_per_family(self, bench_mod):
        assert bench_mod._orbit_cams() is None          # t23d default
        bench_mod._apply_family('ffhq')
        cams = bench_mod._orbit_cams()
        assert cams.shape == (24, 25)
        assert np.isfinite(cams).all()


class TestResultContract:

    def test_rank_full_beats_partial(self, bench_mod):
        full = {'value': 9.0}
        partial = {'value': 1.0, 'partial': True,
                   'phases': {'a': 0.5, 'b': 0.5}}
        assert bench_mod._rank(full) < bench_mod._rank(partial)
        assert bench_mod._rank({'value': None}) > bench_mod._rank(partial)
        fuller = {'value': 0.9, 'partial': True,
                  'phases': {'a': 0.3, 'b': 0.3, 'c': 0.3}}
        assert bench_mod._rank(fuller) < bench_mod._rank(partial)

    def test_partial_result_lower_bound_semantics(self, bench_mod):
        out = bench_mod._partial_result({'text_encode': 0.1,
                                         'dit_sample': 2.0})
        assert out['partial'] and out['staged']
        assert out['vs_baseline'] == 0.0     # never a baseline claim
        assert out['value'] == pytest.approx(2.1)
        assert 'NOT yet measured' in out['unit']
        json.dumps(out)                      # driver-parseable

    def test_full_result_has_driver_fields(self, bench_mod):
        out = bench_mod._result(4.4, dit_sps=100.0, mrays=0.5)
        assert set(out) >= {'metric', 'value', 'unit', 'vs_baseline'}
        assert out['vs_baseline'] == pytest.approx(5.0 / 4.4, abs=1e-3)
        assert 'warm' in out['unit']
        json.dumps(out)

    def test_all_phases_partial_still_flagged(self, bench_mod):
        walls = {p: 0.5 for p in bench_mod.PHASE_NAMES}
        out = bench_mod._partial_result(walls)
        assert out['partial']                # only a real e2e run may
        assert out['vs_baseline'] > 0        # present as the full result


class TestParentKillContract:
    """The BENCH_r02/r03 defense, as a unit test (VERDICT r4 #10): a
    child killed MID-PHASE (external deadline) must still leave a
    parseable, clearly-flagged partial as the parent's final line."""

    def test_partial_survives_child_kill(self, bench_mod, monkeypatch,
                                         tmp_path, capsys):
        stub = tmp_path / 'stub_child.py'
        stub.write_text(
            "import json, sys, time\n"
            "print(json.dumps({'metric': 'text_to_mesh_wall_clock',"
            " 'value': 1.23, 'partial': True, 'staged': True,"
            " 'phases': {'text_encode': 1.23},"
            " 'unit': 's PARTIAL staged sum', 'vs_baseline': 0.0}),"
            " flush=True)\n"
            "time.sleep(120)\n")       # hangs: parent must kill it
        monkeypatch.setattr(bench_mod, '_child_cmd',
                            lambda: [sys.executable, str(stub)])
        monkeypatch.setenv('BENCH_DEADLINE_S', '6')
        t0 = __import__('time').monotonic()
        bench_mod._parent()
        wall = __import__('time').monotonic() - t0
        assert wall < 30, wall          # the kill actually happened
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith('{')]
        assert lines, 'parent emitted no JSON'
        final = json.loads(lines[-1])
        assert final['metric'] == 'text_to_mesh_wall_clock'
        assert final['partial'] is True
        assert final['value'] == pytest.approx(1.23)
        # a partial can never read as a baseline claim
        assert final['vs_baseline'] == 0.0

    def test_silent_child_yields_failure_record(self, bench_mod,
                                                monkeypatch, tmp_path,
                                                capsys):
        stub = tmp_path / 'mute_child.py'
        stub.write_text("import time\ntime.sleep(120)\n")
        monkeypatch.setattr(bench_mod, '_child_cmd',
                            lambda: [sys.executable, str(stub)])
        monkeypatch.setenv('BENCH_DEADLINE_S', '5')
        bench_mod._parent()
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith('{')]
        final = json.loads(lines[-1])
        assert final['value'] is None
        assert 'FAILED' in final['unit']

    def test_wedged_child_respawned_by_watchdog(self, bench_mod,
                                                monkeypatch, tmp_path,
                                                capsys):
        """A child wedged BEFORE its first line (the stuck-tunnel mode:
        390 s silent with a warm cache) must be killed at BENCH_STALL_S
        and respawned — a fresh process redraws the tunnel connection."""
        marker = tmp_path / 'spawns'
        stub = tmp_path / 'wedged_child.py'
        stub.write_text(
            "import sys, time\n"
            f"open(r'{marker}', 'a').write('x')\n"
            "time.sleep(120)\n")      # silent forever
        monkeypatch.setattr(bench_mod, '_child_cmd',
                            lambda: [sys.executable, str(stub)])
        monkeypatch.setenv('BENCH_STALL_S', '3')
        monkeypatch.setenv('BENCH_DEADLINE_S', '70')
        t0 = __import__('time').monotonic()
        bench_mod._parent()
        wall = __import__('time').monotonic() - t0
        assert marker.read_text() == 'xx', 'expected exactly 2 spawns'
        # both children die at the 3 s watchdog — the parent finishes
        # far inside the deadline instead of burning it all
        assert wall < 40, wall
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith('{')]
        final = json.loads(lines[-1])
        assert final['value'] is None and 'FAILED' in final['unit']
