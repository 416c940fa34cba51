"""Subprocess-isolated multichip dryrun (VERDICT r2 next #1).

The driver validates multi-chip sharding by calling
``__graft_entry__.dryrun_multichip(n)`` from a process whose interpreter
already initialized a TPU PJRT backend; in-process platform switching failed
in that context two rounds running. The fix is architectural: re-exec the
mesh step in a scrubbed child (saunet_tpu/parallel/dryrun.py). These tests
run that subprocess variant from a parent that has ALREADY initialized a
backend (the suite's conftest boots the 8-device CPU platform at import),
which is exactly the driver's failure mode.

Reference stack this gate is the driver-side proof for:
/root/reference/lib/nn/modules/batchnorm.py:98-117,
/root/reference/lib/nn/parallel/data_parallel.py:53-96.
"""
import os
import sys

import jax
import pytest

from saunet_tpu.parallel import dryrun

SLOW = os.environ.get("SKIP_SLOW_TESTS", "") == "1"


def test_scrubbed_env_removes_backend_knobs(monkeypatch):
    """Every accelerator-selecting env var must be gone from the child env,
    and PYTHONPATH entries that ship a sitecustomize must be dropped —
    those are the two vectors by which this environment pins a TPU plugin
    into fresh interpreters."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    monkeypatch.setenv("TPU_LIBRARY_PATH", "/opt/libtpu.so")
    monkeypatch.setenv("XLA_FLAGS", "--xla_tpu_something=1")
    monkeypatch.setenv("PJRT_DEVICE", "TPU")
    env = dryrun.scrubbed_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "TPU_LIBRARY_PATH" not in env
    assert "PJRT_DEVICE" not in env
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "xla_tpu_something" not in env["XLA_FLAGS"]
    # no sitecustomize/usercustomize reachable from the child's PYTHONPATH
    for entry in env.get("PYTHONPATH", "").split(os.pathsep):
        if not entry:
            continue
        assert not os.path.exists(os.path.join(entry, "sitecustomize.py")), \
            entry
        assert not os.path.exists(os.path.join(entry, "usercustomize.py")), \
            entry


def test_cpu_cache_keyed_by_host_features():
    """The persistent XLA:CPU cache must be keyed by the host's ISA
    feature flags: artifacts AOT-compiled on a different machine must
    land in (and be looked up from) a different directory, so a host
    change degrades to a cold recompile instead of a possible SIGILL
    (MULTICHIP_r03's tail logged exactly that hazard)."""
    a = dryrun.host_feature_tag("flags\t: sse2 avx2 fma\n")
    a_reordered = dryrun.host_feature_tag("flags\t: fma avx2 sse2\n")
    b = dryrun.host_feature_tag("flags\t: sse2 avx512f fma\n")
    assert a == a_reordered  # stable under flag ordering
    assert a != b            # different ISA -> different cache key
    # arm-style cpuinfo uses "Features"
    assert dryrun.host_feature_tag("Features\t: fp asimd\n") != a
    # the live cache dir is nested under .jax_cache_cpu by this host's tag
    parent, tag = os.path.split(dryrun.CPU_CACHE_DIR)
    assert os.path.basename(parent) == ".jax_cache_cpu"
    assert tag == dryrun.host_feature_tag()
    # and both the child env and the in-child config point at it
    assert dryrun.scrubbed_env(8)["JAX_COMPILATION_CACHE_DIR"] == \
        dryrun.CPU_CACHE_DIR


def test_scrubbed_child_sees_cpu_platform_only():
    """A child launched with the scrubbed env must come up as a pure
    n-device CPU platform even though THIS process has a live backend."""
    assert jax.devices()  # parent backend is initialized (conftest)
    import subprocess
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices(); "
         "print(d[0].platform, len(d))"],
        env=dryrun.scrubbed_env(4), cwd=dryrun.REPO_ROOT,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.split() == ["cpu", "4"], out.stdout


@pytest.mark.skipif(SLOW, reason="SKIP_SLOW_TESTS=1")
def test_run_subprocess_from_initialized_parent():
    """The driver-shaped scenario end-to-end: parent has a live backend,
    run_subprocess(8) must still jit + execute the full ('data','space')
    SPMD train step in the child and exit 0. Near-instant when
    .jax_cache_cpu is warm; ~10 min cold on one vCPU."""
    assert jax.devices()  # parent backend is initialized
    dryrun.run_subprocess(8)  # raises on failure


def test_aot_false_positive_filter():
    """Only the two known same-host false positives — XLA compile-TUNING
    pseudo-features +prefer-no-gather/+prefer-no-scatter, which host CPU
    detection never reports — may be dropped from the gate's tail; a
    mismatch naming a REAL ISA feature (a genuinely foreign artifact)
    must pass through. Origin experiment (r5): cold run after
    rm -rf .jax_cache_cpu logs ZERO aot lines; the same-host warm re-run
    logs exactly these two, with identical loss."""
    fp = ("E0820 22:48:18.781456 6960 cpu_aot_loader.cc:210] Loading "
          "XLA:CPU AOT result. Target machine feature +prefer-no-gather "
          "is not  supported on the host machine. Machine type used for "
          "XLA:CPU compilation doesn't match ... such as SIGILL.\n")
    assert dryrun._AOT_FALSE_POSITIVE.search(fp)
    assert dryrun._AOT_FALSE_POSITIVE.search(
        fp.replace("prefer-no-gather", "prefer-no-scatter"))
    # real ISA mismatches (foreign artifact) are NOT filtered
    assert not dryrun._AOT_FALSE_POSITIVE.search(
        fp.replace("prefer-no-gather", "amx-fp16"))
    assert not dryrun._AOT_FALSE_POSITIVE.search(
        fp.replace("prefer-no-gather", "avx512vp2intersect"))
    # unrelated lines untouched
    assert not dryrun._AOT_FALSE_POSITIVE.search(
        "dryrun_multichip(8): mesh={'data': 4, 'space': 2} ok\n")


def test_run_subprocess_filters_false_positive_lines(monkeypatch, capsys):
    """End-to-end through run_subprocess: a child emitting one false
    positive, one REAL mismatch, and the ok line must surface everything
    except the false positive."""
    import subprocess as sp
    orig_popen = sp.Popen
    child = (
        "import sys\n"
        "print('E0101 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
        "Target machine feature +prefer-no-gather is not  supported on "
        "the host machine. could lead to execution errors such as "
        "SIGILL.')\n"
        "print('E0101 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
        "Target machine feature +amx-fp16 is not  supported on the host "
        "machine.')\n"
        "print('dryrun ok')\n")

    def fake_popen(cmd, **kw):
        return orig_popen([sys.executable, "-c", child], **kw)

    monkeypatch.setattr(sp, "Popen", fake_popen)
    dryrun.run_subprocess(8)
    out = capsys.readouterr().out
    assert "prefer-no-gather" not in out
    assert "+amx-fp16" in out      # real mismatches still surface
    assert "dryrun ok" in out


def test_run_subprocess_propagates_failure(monkeypatch):
    """rc != 0 in the child must surface as an exception with the tail —
    a gate that cannot fail is not a gate."""
    real_env = dryrun.scrubbed_env(8)
    real_env["SAUNET_DRYRUN_BOOM"] = "1"
    monkeypatch.setattr(dryrun, "scrubbed_env", lambda n: real_env)
    monkeypatch.setattr(
        sys, "executable", sys.executable, raising=True)
    import subprocess as sp
    orig_popen = sp.Popen

    def fake_popen(cmd, **kw):
        return orig_popen(
            [sys.executable, "-c",
             "import sys; print('child exploding'); sys.exit(3)"],
            **kw)

    monkeypatch.setattr(sp, "Popen", fake_popen)
    with pytest.raises(RuntimeError, match="rc=3"):
        dryrun.run_subprocess(8)
