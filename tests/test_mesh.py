"""Mesh / multi-host bring-up unit tests (parallel/mesh.py)."""

import pytest


def test_build_mesh_axes(mesh8, mesh4x2):
    assert mesh8.n_data == 8 and mesh8.n_model == 1
    assert mesh4x2.n_data == 4 and mesh4x2.n_model == 2
    assert mesh8.is_primary()


def test_initialize_distributed_idempotent(monkeypatch):
    """Second call / already-initialized runtime is a logged no-op, not an
    exception-swallow."""
    import jax

    from visiondk_tpu.parallel.mesh import initialize_distributed

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(
            RuntimeError("jax.distributed.initialize() was already initialized")
        ),
    )
    logs = []

    class L:
        def both(self, m):
            logs.append(m)

    assert initialize_distributed(logger=L()) is False
    assert any("already initialized" in m for m in logs)


def test_initialize_distributed_failure_raises(monkeypatch):
    """A genuine bring-up failure propagates instead of silently degrading to
    single-host (the round-1 swallow-all bug)."""
    import jax

    from visiondk_tpu.parallel.mesh import initialize_distributed

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(RuntimeError("connection refused")),
    )
    with pytest.raises(RuntimeError, match="connection refused"):
        initialize_distributed(coordinator_address="10.0.0.1:1234")


def test_initialize_distributed_single_process_fallback(monkeypatch):
    """No args + no cluster env (ValueError from auto-detection) → explicit
    single-process fallback; the same error WITH args is a misconfiguration."""
    import jax

    from visiondk_tpu.parallel.mesh import initialize_distributed

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(ValueError("cannot autodetect coordinator")),
    )
    assert initialize_distributed() is False
    with pytest.raises(ValueError):
        initialize_distributed(coordinator_address="10.0.0.1:1234", num_processes=2,
                               process_id=0)


def test_initialize_distributed_success(monkeypatch):
    import jax

    from visiondk_tpu.parallel.mesh import initialize_distributed

    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: None)
    assert initialize_distributed(coordinator_address="x:1", num_processes=1,
                                  process_id=0) is True


def test_replicated_eval_guard(monkeypatch):
    """Multi-host eval stance (round-2 review weak #6): replicated eval is
    enforced — a shuffled or process-sharded eval loader under >1 processes
    raises instead of silently diverging/hanging."""
    import jax

    from visiondk_tpu.parallel import build_mesh

    ctx = build_mesh()
    # single process: anything goes (no contract to enforce)
    ctx.check_replicated_eval(shuffle=True, process_sharded=True)

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    ctx.check_replicated_eval(shuffle=False, process_sharded=False)  # ok
    with pytest.raises(ValueError, match="replicated"):
        ctx.check_replicated_eval(shuffle=True)
    with pytest.raises(ValueError, match="replicated"):
        ctx.check_replicated_eval(process_sharded=True)
