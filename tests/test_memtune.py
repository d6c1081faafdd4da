"""memtune: glibc malloc tuning applied at every kernel entry point.

Why it exists: glibc serves >128 KB allocations with mmap and returns
them with munmap on free, so each Arrow batch's numpy arrays round-trip
tens of MB of pages through the OS; on the sandbox hypervisor the
re-fault intermittently costs 100-1000x (measured 30 ms <-> 28 s for
the same 100 MB first-touch — PLANS.md round-5 addendum). These tests
pin the tuning surface, not the hypervisor behavior.
"""

import os
import subprocess
import sys

from pdf2dom_spark import memtune


def test_tune_malloc_applies_on_glibc():
    # this sandbox is glibc Linux, so mallopt must succeed (and the
    # second call must short-circuit via the idempotence flag)
    assert memtune.tune_malloc() is True
    assert memtune.tune_malloc() is True


def test_tuned_env_sets_thresholds_without_mutating_os_environ():
    before = dict(os.environ)
    env = memtune.tuned_env()
    assert env["MALLOC_MMAP_THRESHOLD_"] == str(memtune.THRESHOLD_BYTES)
    assert env["MALLOC_TRIM_THRESHOLD_"] == str(memtune.THRESHOLD_BYTES)
    assert dict(os.environ) == before
    # respects pre-set values (setdefault semantics): a deployment that
    # tunes its own thresholds is not overridden
    env2 = memtune.tuned_env({"MALLOC_MMAP_THRESHOLD_": "65536"})
    assert env2["MALLOC_MMAP_THRESHOLD_"] == "65536"


def test_tuned_process_reuses_heap_for_large_arrays():
    """End-to-end observable effect: with the thresholds raised, a
    large allocation freed and re-made comes back at the SAME heap
    address (glibc reused the block); untuned glibc mmaps it fresh.
    Run in a subprocess so this test controls the allocator state."""
    code = r"""
import ctypes
from pdf2dom_spark import memtune
assert memtune.tune_malloc()
SZ = 8 * 1024 * 1024  # far above the default 128 KB mmap threshold
addrs = set()
for _ in range(4):
    buf = ctypes.create_string_buffer(SZ)
    addrs.add(ctypes.addressof(buf))
    del buf
print(len(addrs))
"""
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    # heap reuse: the four allocations reuse freed heap blocks instead of
    # fresh mmaps. <=2 distinct addresses tolerates one glibc bin/tcache
    # split (ADVICE r5: exact single-address reuse flaked across glibc
    # policies); 4 distinct addresses would mean mmap-per-allocation.
    assert int(out.stdout.strip()) <= 2, out.stdout
