"""Bound the refshim overhead inside the reference 17-step baseline.

BASELINE_REF.json's 0.106 pages/s denominator was measured with
tools/refshims standing in for deps that aren't installable here
(freetype-py, python-barcode, rectpack, Faker, pytz, intervaltree,
pyclipper).  This tool runs the SAME pipeline under cProfile and reports
how much wall time is attributable to shim code (cumulative time of
calls whose frame lives under tools/refshims/, counted at the shim
boundary so nested shim->shim calls aren't double counted).

If shims account for fraction f of the run, then even INFINITELY fast
real libraries could speed the reference by at most 1/(1-f): the
denominator's optimism is bounded by that factor.  Result is written to
BASELINE_REF.json (`refshim_time_fraction`, `refshim_speedup_bound`).

Usage: python tools/profile_refshims.py [--num-seeds 3]
"""
import argparse
import cProfile
import json
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SHIM_DIR = str(REPO / 'tools' / 'refshims')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num-seeds', type=int, default=3)
    args = parser.parse_args()

    # Reuse the measurement tool's import-order setup and builders.
    sys.path.insert(0, str(REPO / 'tools'))
    import measure_reference_pipeline as mrp

    import numpy as np
    from tests.pipeline.fixtures import build_assets

    assets = build_assets(Path('/tmp/ref_pipeline_assets'))
    pipeline = mrp.build_reference_pipeline(assets)
    pipeline.run(np.random.default_rng(0))  # warm: font load, engine init

    profile = cProfile.Profile()
    begin = time.perf_counter()
    done = 0
    profile.enable()
    for seed in range(1, args.num_seeds + 1):
        try:
            pipeline.run(np.random.default_rng(seed * 97))
            done += 1
        except Exception as exc:  # noqa: BLE001 - retry-free: bound only
            print(f'seed {seed}: {type(exc).__name__}: {exc}', flush=True)
    profile.disable()
    elapsed = time.perf_counter() - begin
    assert done, 'no reference pipeline run succeeded'

    stats = pstats.Stats(profile)
    total = stats.total_tt

    # Shim-attributable time: tottime of every frame inside refshims/ PLUS
    # time those frames spend in their callees OUTSIDE refshims (e.g. the
    # freetype shim calling PIL).  Equivalently: cumtime summed over shim
    # frames whose CALLERS are all outside refshims (the shim boundary).
    shim_boundary_cum = 0.0
    shim_tottime = 0.0
    for func, (cc, nc, tt, ct, callers) in stats.stats.items():
        filename = func[0]
        if not filename.startswith(SHIM_DIR):
            continue
        shim_tottime += tt
        called_from_outside_only = all(
            not caller[0].startswith(SHIM_DIR) for caller in callers
        ) if callers else True
        if called_from_outside_only:
            shim_boundary_cum += ct

    fraction = min(shim_boundary_cum / total, 1.0) if total else 0.0
    bound = 1.0 / (1.0 - fraction) if fraction < 1.0 else float('inf')
    rate = done / elapsed
    print(f'{done} pages in {elapsed:.1f}s ({rate:.3f}/s profiled)')
    print(f'profiled total: {total:.1f}s; shim tottime: {shim_tottime:.2f}s; '
          f'shim boundary cumtime: {shim_boundary_cum:.2f}s '
          f'-> fraction {fraction:.3f}')
    print(f'even infinitely fast real deps could speed the reference '
          f'by at most {bound:.2f}x')

    path = REPO / 'BASELINE_REF.json'
    data = json.loads(path.read_text()) if path.exists() else {}
    data['refshim_time_fraction'] = round(fraction, 4)
    data['refshim_speedup_bound'] = round(bound, 3)
    path.write_text(json.dumps(data, indent=2) + '\n')
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
