

def test_make_multihost_mesh_single_process():
    """Single process: reduces to the plain local mesh."""
    from vkit_tpu.parallel import make_mesh, make_multihost_mesh

    mesh = make_multihost_mesh()
    ref = make_mesh()
    assert dict(mesh.shape) == dict(ref.shape)


def test_multiprocess_dryrun_optin():
    """2-process dryrun over localhost jax.distributed (slow; opt in with
    VKIT_TPU_TEST_MULTIPROCESS=1)."""
    import os
    import pytest

    if not os.environ.get('VKIT_TPU_TEST_MULTIPROCESS'):
        pytest.skip('set VKIT_TPU_TEST_MULTIPROCESS=1 to run')
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__; '
         '__graft_entry__.dryrun_multichip(8, num_processes=2)'],
        cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )),
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
