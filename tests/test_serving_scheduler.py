"""ServingScheduler: the two multi-song postures (whole_mesh vs submesh)
over the virtual 8-device CPU mesh (SURVEY §2.2 / §7.9 "multi-song
throughput serving"; replaces the reference's per-song thread model,
reference src/mdx.py:238-243).

Fast tier: lane construction, job ordering, failure isolation, config knobs
(fake pipelines — no device compute).  Slow tier: real tiny covers through
two single-device submesh lanes on different CPU devices, asserted
identical.  The 8-job both-posture parity round runs in the driver dryrun
(__graft_entry__._serving_throughput_dryrun).
"""

import threading

import numpy as np
import pytest

from aicovergen_tpu.parallel.serving import Lane, ServingScheduler


class FakePipeline:
    def __init__(self, mesh=None, fail_on=None, delay=0.0):
        self.mesh = mesh
        self.fail_on = fail_on or set()
        self.delay = delay
        self.covered = []
        self.drained = 0
        self.lock = threading.Lock()

    def song_cover(self, **job):
        import time

        if self.delay:
            time.sleep(self.delay)
        with self.lock:
            self.covered.append(job["song_input"])
        if job["song_input"] in self.fail_on:
            raise RuntimeError(f"boom:{job['song_input']}")
        return f"out/{job['song_input']}"

    def drain_cache(self, raise_errors=False):
        self.drained += 1


def test_whole_mesh_lanes_share_one_pipeline():
    made = []

    def factory(mesh):
        p = FakePipeline(mesh)
        made.append(p)
        return p

    s = ServingScheduler(None, posture="whole_mesh", n_devices=8, workers=3,
                         pipeline_factory=factory)
    assert len(made) == 1
    assert len(s.lanes) == 3
    assert all(l.pipeline is made[0] for l in s.lanes)
    # full-mesh pipeline got an 8-wide data axis
    assert made[0].mesh is not None and made[0].mesh.shape["data"] == 8
    assert len(s.pipelines) == 1


def test_submesh_lanes_partition_devices():
    made = []

    def factory(mesh):
        p = FakePipeline(mesh)
        made.append(p)
        return p

    s = ServingScheduler(None, posture="submesh", n_devices=8,
                         submesh_devices=2, pipeline_factory=factory)
    assert len(s.lanes) == len(made) == 4
    # each lane's mesh covers its own disjoint device pair
    seen = set()
    for lane, pipe in zip(s.lanes, made):
        assert pipe.mesh.shape["data"] == 2
        devs = tuple(d.id for d in pipe.mesh.devices.ravel())
        assert not (set(devs) & seen)
        seen.update(devs)
        assert lane.device.id == devs[0]
    assert len(seen) == 8

    # single-device lanes get mesh=None (plain pipeline, pinned by lane.device)
    s1 = ServingScheduler(None, posture="submesh", n_devices=4,
                          submesh_devices=1, pipeline_factory=factory)
    assert all(l.pipeline.mesh is None for l in s1.lanes)
    assert sorted(l.device.id for l in s1.lanes) == [0, 1, 2, 3]


def test_posture_and_divisibility_validation():
    with pytest.raises(ValueError, match="posture"):
        ServingScheduler(None, posture="magic", pipeline_factory=FakePipeline)
    with pytest.raises(ValueError, match="divide"):
        ServingScheduler(None, posture="submesh", n_devices=8,
                         submesh_devices=3, pipeline_factory=FakePipeline)


def test_run_preserves_job_order_and_isolates_failures():
    s = ServingScheduler(
        None, posture="submesh", n_devices=8, submesh_devices=1,
        pipeline_factory=lambda mesh: FakePipeline(mesh, fail_on={"song3"},
                                                   delay=0.01),
    )
    jobs = [{"song_input": f"song{i}"} for i in range(10)]
    results = s.run(jobs)
    assert len(results) == 10
    for i, r in enumerate(results):
        if i == 3:
            assert isinstance(r, RuntimeError) and "song3" in str(r)
        else:
            assert r == f"out/song{i}"
    # every job ran exactly once, spread over the lanes
    covered = [x for l in s.pipelines for x in l.covered]
    assert sorted(covered) == sorted(j["song_input"] for j in jobs)
    s.drain()
    assert all(p.drained == 1 for p in s.pipelines)


def test_scheduler_from_config_env(monkeypatch):
    from aicovergen_tpu.parallel import serving

    made = {}
    orig = ServingScheduler.__init__

    def spy(self, store, **kw):
        made.update(kw)
        # construct nothing heavy
        self.lanes = []
        self.posture = kw["posture"]
        self.store = store

    monkeypatch.setattr(ServingScheduler, "__init__", spy)
    monkeypatch.setenv("AICG_SERVING_POSTURE", "submesh")
    monkeypatch.setenv("AICG_SUBMESH_DEVICES", "2")
    s = serving.scheduler_from_config(None, workers=6)
    assert made["posture"] == "submesh"
    assert made["submesh_devices"] == 2
    assert made["workers"] == 6
    monkeypatch.setattr(ServingScheduler, "__init__", orig)


# --------------------------------------------------------------------- slow
from test_full_cover import asset_base  # noqa: F401, E402  (fixture reuse)


@pytest.mark.slow
def test_submesh_lanes_produce_identical_covers(asset_base, tmp_path):  # noqa: F811
    """Two real tiny covers of the same waveform (distinct files -> distinct
    song ids) through two single-device submesh lanes: outputs must be
    sample-identical — device placement must not change the cover."""
    import shutil

    from aicovergen_tpu.io.audio import read_wav
    from aicovergen_tpu.utils.config import RuntimeConfig

    store, song_path = asset_base
    # byte-identical twin (a float->int16 re-encode would shift large
    # samples by 1 LSB: read scales /32768, write *32767): distinct path ->
    # distinct basename, same waveform
    song_b = str(tmp_path / "song_twin.wav")
    shutil.copyfile(song_path, song_b)

    runtime = RuntimeConfig(x_pad=1, x_query=2, x_center=5, x_max=8,
                            bucket_samples=16000)
    from aicovergen_tpu.pipeline.cover import CoverPipeline

    s = ServingScheduler(
        store, posture="submesh", n_devices=2, submesh_devices=1,
        pipeline_factory=lambda mesh: CoverPipeline(
            store, runtime=runtime, mesh=mesh, stem_cache="off",
            mdx_batch_size=4,
        ),
    )
    jobs = [
        dict(song_input=song_path, voice_model="TestVoice", pitch_change=0,
             index_rate=0.0, output_format="wav"),
        dict(song_input=song_b, voice_model="TestVoice", pitch_change=0,
             index_rate=0.0, output_format="wav"),
    ]
    # pin one job per lane so the comparison really crosses devices
    res = []
    ths = []
    for lane, job in zip(s.lanes, jobs):
        def run_one(lane=lane, job=job):
            import jax

            with jax.default_device(lane.device):
                res.append(lane.pipeline.song_cover(**job))

        t = threading.Thread(target=run_one)
        t.start()
        ths.append(t)
    for t in ths:
        t.join()
    assert len(res) == 2
    a, _ = read_wav(res[0])
    b, _ = read_wav(res[1])
    np.testing.assert_array_equal(a, b)
    shutil.rmtree(store.output_dir, ignore_errors=True)
