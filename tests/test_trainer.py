"""Trainer tests: sharded steps on the fake 8-device mesh, checkpoint resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from nic_tpu.parallel.mesh import data_mesh
from nic_tpu.train.trainer import TrainConfig, Trainer


def make_cfg(tmp_path, **kw):
    defaults = dict(
        model="mbt2018",
        num_filters=4,
        lmbda=0.01,
        batchsize=8,
        patchsize=64,
        last_step=4,
        checkpoint_dir=str(tmp_path),
        log_every=1,
        save_checkpoint_secs=10_000,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def batches(cfg, n=100):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield rng.random((cfg.batchsize, cfg.patchsize, cfg.patchsize, 3), dtype=np.float32)


class TestTrainer:
    @pytest.mark.slow
    def test_runs_on_8_device_mesh(self, tmp_path):
        assert jax.device_count() >= 8
        assert data_mesh().devices.size == 8
        cfg = make_cfg(tmp_path)
        trainer = Trainer(cfg)
        state = trainer.fit(iter(batches(cfg)), verbose=False)
        assert int(state.step) == 4
        metrics_file = os.path.join(trainer.save_dir, "metrics.jsonl")
        assert os.path.exists(metrics_file)

    @pytest.mark.slow
    def test_loss_decreases(self, tmp_path):
        cfg = make_cfg(tmp_path, last_step=30, lmbda=0.1, log_every=30)
        trainer = Trainer(cfg)
        state = trainer.init_state()
        step_fn = trainer.step_fn
        from nic_tpu.parallel.mesh import batch_sharding

        bsh = batch_sharding(trainer.mesh)
        losses = []
        it = iter(batches(cfg))
        # Fixed batch so the objective is deterministic per step.
        batch = jax.device_put(next(it), bsh)
        for _ in range(30):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_dual_optimizer_moves_quantiles(self, tmp_path):
        cfg = make_cfg(tmp_path, last_step=3)
        trainer = Trainer(cfg)
        state = trainer.init_state()
        q0 = np.array(state.params["entropy_bottleneck"]["quantiles"])
        state = trainer.fit(iter(batches(cfg)), state=state, verbose=False)
        q1 = np.array(state.params["entropy_bottleneck"]["quantiles"])
        assert not np.allclose(q0, q1), "aux optimizer should move quantiles"

    @pytest.mark.slow
    def test_checkpoint_resume(self, tmp_path):
        cfg = make_cfg(tmp_path, last_step=2)
        trainer = Trainer(cfg)
        state = trainer.fit(iter(batches(cfg)), verbose=False)
        assert latest_step(trainer.save_dir) == 2
        # Resume continues from step 2 to 5.
        cfg2 = make_cfg(tmp_path, last_step=5)
        trainer2 = Trainer(cfg2)
        state2 = trainer2.fit(iter(batches(cfg2)), verbose=False)
        assert int(state2.step) == 5

    @pytest.mark.slow
    def test_bb_trainer_single_optimizer(self, tmp_path):
        cfg = make_cfg(tmp_path, model="mbt2018_bb", last_step=2)
        trainer = Trainer(cfg)
        state = trainer.fit(iter(batches(cfg)), verbose=False)
        assert int(state.step) == 2

    @pytest.mark.slow
    def test_msssim_objective(self, tmp_path):
        """MS-SSIM distortion: trains, reports the metric, names the run."""
        # 192 = smallest multiple of 64 (training shape-alignment, same
        # constraint as the reference) that satisfies MS-SSIM's >= 176.
        cfg = make_cfg(tmp_path, distortion="msssim", patchsize=192,
                       batchsize=8, last_step=1)
        trainer = Trainer(cfg)
        assert "distortion=msssim" in cfg.resolved_runname()
        state = trainer.init_state()
        from nic_tpu.parallel.mesh import batch_sharding

        batch = next(iter(batches(cfg)))
        state, metrics = trainer.step_fn(
            state, jax.device_put(batch, batch_sharding(trainer.mesh))
        )
        m = jax.device_get(metrics)
        assert 0.0 <= float(m["msssim"]) <= 1.0
        assert np.isfinite(float(m["loss"]))
        # The reported loss metric is the RD objective (pre-aux):
        # lmbda * (1 - msssim) + bpp.
        expected = cfg.lmbda * (1.0 - float(m["msssim"])) + float(m["bpp"])
        np.testing.assert_allclose(float(m["loss"]), expected, rtol=1e-4)

    @pytest.mark.slow
    def test_grad_clip_bounds_update_norm(self, tmp_path):
        # With a tiny clip the parameter update per step is bounded by
        # lr * sqrt(n_params) (Adam normalizes per-coordinate, so the bound
        # is loose); mainly: the clipped step must differ from the unclipped
        # one and both must run under the same jit/sharding path.
        cfg = make_cfg(tmp_path, num_devices=1, batchsize=2, patchsize=64)
        cfg_clip = make_cfg(
            tmp_path, num_devices=1, batchsize=2, patchsize=64, grad_clip=1e-6
        )
        batch = next(batches(cfg))
        outs = {}
        for name, c in [("plain", cfg), ("clip", cfg_clip)]:
            t = Trainer(c)
            state = t.init_state()
            state, _ = t.step_fn(state, batch)
            outs[name] = state.params
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), outs["plain"], outs["clip"]
        )
        assert max(jax.tree.leaves(diff)) > 0  # clipping changed the step

    def test_msssim_needs_large_patches(self, tmp_path):
        with pytest.raises(ValueError, match="patchsize"):
            Trainer(make_cfg(tmp_path, distortion="msssim", patchsize=64))

    @pytest.mark.slow
    def test_params_only_restore_ignores_opt_state_structure(self, tmp_path):
        # A checkpoint written WITH grad_clip (chain-wrapped opt_state) must
        # load on an inference path built WITHOUT it, and vice versa.
        cfg = make_cfg(tmp_path, last_step=1, grad_clip=5.0,
                       num_devices=1, batchsize=2)
        trainer = Trainer(cfg)
        trainer.fit(iter(batches(cfg)), verbose=False)
        plain = Trainer(make_cfg(tmp_path, num_devices=1, batchsize=2))
        step, params = plain.restore_params_only()
        assert step == 1
        trained = trainer.restore_or_init().params
        leaves_a = jax.tree.leaves(params)
        leaves_b = jax.tree.leaves(trained)
        assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))

    def test_npz_archive_survives_orbax_deletion(self, tmp_path):
        # fit() writes a durable params-<step>.npz next to the orbax tree;
        # with the orbax checkpoints gone (round reset: only git-tracked
        # files survive), restore_params_only falls back to the archive.
        import shutil

        cfg = make_cfg(tmp_path, last_step=2, num_devices=1, batchsize=2)
        trainer = Trainer(cfg)
        trainer.fit(iter(batches(cfg)), verbose=False)
        trained = trainer.restore_or_init().params
        npz = os.path.join(trainer.save_dir, "params-2.npz")
        assert os.path.exists(npz)
        for name in os.listdir(trainer.save_dir):
            if name.startswith("ckpt-"):
                shutil.rmtree(os.path.join(trainer.save_dir, name))
        fresh = Trainer(make_cfg(tmp_path, num_devices=1, batchsize=2))
        step, params = fresh.restore_params_only()
        assert step == 2
        leaves_a = jax.tree.leaves(params)
        leaves_b = jax.tree.leaves(trained)
        assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))

    def test_same_step_npz_wins_over_orbax(self, tmp_path):
        # Post-hoc repairs (scripts/converge_aux.py) rewrite only the
        # params-<step>.npz; when its step >= the latest orbax step, the
        # eval/inference restore must pick the npz, else the repair is
        # silently ignored (round-4 pipeline bug). Orbax stays
        # authoritative when strictly ahead.
        from flax import traverse_util

        from nic_tpu.train import checkpoint as ck

        cfg = make_cfg(tmp_path, last_step=2, num_devices=1, batchsize=2)
        trainer = Trainer(cfg)
        trainer.fit(iter(batches(cfg)), verbose=False)
        npz = os.path.join(trainer.save_dir, "params-2.npz")
        assert os.path.exists(npz)
        _, params = ck.load_params_npz(npz)
        flat = traverse_util.flatten_dict(params, sep="/")
        key = sorted(flat)[0]
        flat[key] = np.asarray(flat[key]) + 1.0  # the "repair"
        with open(npz, "wb") as f:
            np.savez_compressed(
                f, **{k: np.asarray(v, np.float32) for k, v in flat.items()}
            )
        fresh = Trainer(make_cfg(tmp_path, num_devices=1, batchsize=2))
        step, restored = fresh.restore_params_only()
        assert step == 2
        rflat = traverse_util.flatten_dict(restored, sep="/")
        np.testing.assert_allclose(np.asarray(rflat[key]), flat[key])

        # Orbax strictly ahead: npz at a lower step must NOT win.
        os.rename(npz, os.path.join(trainer.save_dir, "params-1.npz"))
        step, restored = fresh.restore_params_only()
        assert step == 2
        rflat = traverse_util.flatten_dict(restored, sep="/")
        assert not np.allclose(np.asarray(rflat[key]), flat[key])

    def test_init_from_warm_starts_params(self, tmp_path):
        # A new lambda run seeded from a donor run starts from the donor's
        # trained params (step 0, fresh optimizer) — the rate-point
        # finetuning path. Resume precedence: once the new run has its own
        # checkpoint, init_from is ignored.
        donor_cfg = make_cfg(tmp_path, last_step=2, num_devices=1, batchsize=2)
        donor = Trainer(donor_cfg)
        donor.fit(iter(batches(donor_cfg)), verbose=False)
        donor_params = donor.restore_or_init().params

        ft_cfg = make_cfg(
            tmp_path, lmbda=0.04, last_step=1, num_devices=1, batchsize=2,
            init_from=donor.save_dir,
        )
        ft = Trainer(ft_cfg)
        state = ft.restore_or_init()
        assert int(state.step) == 0
        leaves_a = jax.tree.leaves(state.params)
        leaves_b = jax.tree.leaves(donor_params)
        assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))
        # Own checkpoint wins over init_from on restart.
        ft.fit(iter(batches(ft_cfg)), verbose=False)
        resumed = Trainer(ft_cfg).restore_or_init()
        assert int(resumed.step) == 1

    def test_init_from_partial_cross_model(self, tmp_path):
        # mbt2018_bb warm-starts its shared transforms (g_a/g_s/h_s and all
        # but the 2N-output h_a head) from a trained mbt2018; the BMSHJ
        # prior and mismatched head stay fresh. Strict mode refuses.
        from flax import traverse_util

        donor_cfg = make_cfg(tmp_path, last_step=1, num_devices=1, batchsize=2)
        donor = Trainer(donor_cfg)
        donor.fit(iter(batches(donor_cfg)), verbose=False)
        donor_flat = traverse_util.flatten_dict(
            donor.restore_or_init().params, sep="/"
        )

        bb_cfg = make_cfg(
            tmp_path, model="mbt2018_bb", last_step=1, num_devices=1,
            batchsize=2, init_from=donor.save_dir, init_from_partial=True,
        )
        state = Trainer(bb_cfg).restore_or_init()
        bb_flat = traverse_util.flatten_dict(state.params, sep="/")
        transferred = [
            k for k, v in bb_flat.items()
            if k in donor_flat and donor_flat[k].shape == v.shape
        ]
        assert len(transferred) >= 30
        assert all(
            np.allclose(bb_flat[k], donor_flat[k]) for k in transferred
        )
        assert any(k.startswith("hyper_prior/") for k in bb_flat)

        strict = make_cfg(
            tmp_path, model="mbt2018_bb", last_step=1, num_devices=1,
            batchsize=2, init_from=donor.save_dir,
        )
        with pytest.raises(Exception):
            Trainer(strict).restore_or_init()

    def test_init_from_missing_donor_fails(self, tmp_path):
        cfg = make_cfg(
            tmp_path, last_step=1, num_devices=1, batchsize=2,
            init_from=str(tmp_path / "nope"),
        )
        with pytest.raises(FileNotFoundError, match="init_from"):
            Trainer(cfg).restore_or_init()

    @pytest.mark.slow
    def test_divergence_guard(self, tmp_path):
        # A random-init model's first-step loss is ~O(100); a threshold of
        # 1.0 must trip the guard even though the loss is finite.
        cfg = make_cfg(tmp_path, last_step=1, log_every=1,
                       divergence_threshold=1.0)
        trainer = Trainer(cfg)
        with pytest.raises(FloatingPointError, match="Diverged"):
            trainer.fit(iter(batches(cfg)), verbose=False)

    def test_nan_guard(self, tmp_path):
        cfg = make_cfg(tmp_path, last_step=1, log_every=1)
        trainer = Trainer(cfg)

        def nan_batches():
            while True:
                yield np.full((cfg.batchsize, cfg.patchsize, cfg.patchsize, 3), np.nan, np.float32)

        with pytest.raises(FloatingPointError):
            trainer.fit(nan_batches(), verbose=False)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        save_checkpoint(str(tmp_path), 7, state)
        assert latest_step(str(tmp_path)) == 7
        restored = restore_checkpoint(str(tmp_path), jax.tree.map(jnp.zeros_like, state))
        np.testing.assert_allclose(restored["a"], state["a"])
        np.testing.assert_allclose(restored["b"]["c"], state["b"]["c"])


@pytest.mark.slow
class TestTensorBoardSummaries:
    def test_tb_logdir_writes_events_and_images(self, tmp_path):
        pytest.importorskip("tensorflow")
        cfg = make_cfg(tmp_path, last_step=2, logdir=str(tmp_path / "tb"),
                       save_summary_secs=0)
        trainer = Trainer(cfg)
        trainer.fit(iter(batches(cfg)), verbose=False)
        import glob as g

        events = g.glob(str(tmp_path / "tb" / "*" / "events.*"))
        assert events, "TensorBoard event files should be written"


@pytest.mark.slow
class TestStepsPerCall:
    def test_multi_step_matches_single_step(self, tmp_path):
        """Fusing k steps per device call must advance training identically
        in expectation — verify the step counter and finite loss."""
        cfg = make_cfg(tmp_path, last_step=6, steps_per_call=3)
        trainer = Trainer(cfg)
        state = trainer.fit(iter(batches(cfg)), verbose=False)
        assert int(state.step) == 6

    def test_multi_step_deterministic_equivalence(self, tmp_path):
        """k=2 with the same data order gives bitwise the same params as
        k=1 (the scan body is exactly the single step)."""
        data = list(batches(make_cfg(tmp_path), n=4))

        cfg1 = make_cfg(tmp_path / "a", last_step=4, steps_per_call=1)
        t1 = Trainer(cfg1)
        s1 = t1.init_state()
        from nic_tpu.parallel.mesh import batch_sharding
        import jax as _jax

        bsh = batch_sharding(t1.mesh)
        for b in data:
            s1, _ = t1.step_fn(s1, _jax.device_put(b, bsh))

        cfg2 = make_cfg(tmp_path / "b", last_step=4, steps_per_call=2)
        t2 = Trainer(cfg2)
        s2 = t2.init_state()
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh2 = NamedSharding(t2.mesh, P(None, "data"))
        for i in range(0, 4, 2):
            stacked = np.stack(data[i : i + 2])
            s2, _ = t2.step_fn(s2, _jax.device_put(stacked, bsh2))

        a = np.asarray(s1.params["analysis"]["layer_0"]["kernel"])
        b = np.asarray(s2.params["analysis"]["layer_0"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestSupervisor:
    def test_retries_until_success(self, monkeypatch):
        """supervise() re-execs the training command until it exits 0,
        resuming from checkpoints (replaces the round-1 shell retry loop)."""
        from nic_tpu.train import supervisor

        calls = []

        class FakeProc:
            def __init__(self, cmd, env=None):
                calls.append(cmd)

            def wait(self):
                return 1 if len(calls) < 3 else 0

            def poll(self):
                return 0

        monkeypatch.setattr(supervisor.subprocess, "Popen", FakeProc)
        rc = supervisor.supervise(["mbt2018", "train"], retries=3,
                                  backoff_secs=0.0)
        assert rc == 0
        assert len(calls) == 3
        assert calls[0][-2:] == ["mbt2018", "train"]

    def test_exhausted_retries_reports_failure(self, monkeypatch):
        from nic_tpu.train import supervisor

        class FailProc:
            def __init__(self, cmd, env=None):
                pass

            def wait(self):
                return 7

            def poll(self):
                return 7

        monkeypatch.setattr(supervisor.subprocess, "Popen", FailProc)
        assert supervisor.supervise(["x"], retries=1, backoff_secs=0.0) == 7

    def test_sigterm_forwarded_to_child_and_stops_retries(self, monkeypatch):
        """timeout(1) around `--retries N` signals only the supervisor; the
        child must be terminated too or an orphaned trainer keeps the one
        TPU chip busy."""
        import signal as _signal

        from nic_tpu.train import supervisor

        events = []

        class HangingProc:
            def __init__(self, cmd, env=None):
                self._terminated = False

            def poll(self):
                return None if not self._terminated else 143

            def terminate(self):
                self._terminated = True
                events.append("terminated")

            def wait(self):
                # Simulate the wrapper's SIGTERM arriving mid-run.
                os.kill(os.getpid(), _signal.SIGTERM)
                # Handler runs synchronously on this thread; by the time
                # kill() returns the child must have been terminated.
                assert self._terminated
                return 143

        monkeypatch.setattr(supervisor.subprocess, "Popen", HangingProc)
        rc = supervisor.supervise(["x"], retries=5, backoff_secs=0.0)
        assert rc == 143
        assert events == ["terminated"]
