"""Multi-host attach shim (SURVEY.md §5.8 aux subsystem A8).

Real pod-slice behavior needs N hosts; what IS testable on one host: the
autodetect must be a strict no-op (never hijack a single-process run into
a hung coordinator wait), and the process info must describe this process.
"""

from gcm_tpu.parallel import multihost


def test_initialize_is_noop_on_single_host(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert multihost.initialize() is False


def test_localhost_worker_hostnames_do_not_trigger(monkeypatch):
    """Single-host TPU VMs set TPU_WORKER_HOSTNAMES=localhost — that must
    not be mistaken for a pod slice."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.initialize() is False


def test_process_info_single_process():
    info = multihost.process_info()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["local_devices"] >= 1
    assert info["global_devices"] == info["local_devices"]
