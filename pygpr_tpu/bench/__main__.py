"""``python -m pygpr_tpu.bench [flag]`` — benchmark entry points.

  (no flag)     the headline metric set (evals/s, predictions/s,
                weak scaling where devices allow)
  --large-n     BASELINE config 4: grBCM N≈100k, 16 experts, one chip
                (streamed); prints factorize time, predictions/s,
                RMSE/NLPD as one JSON line.
  --iterative   matrix-free exact GP at N=32k on one chip: Krylov
                NLML value+grad (CG + SLQ) with no n×n array; prints
                evals/s and matrix-free predict time as one JSON line.
  --sgpr        SGPR (Titsias) at N≈100k, m=1024 inducing points, one
                chip — directly comparable to the --large-n grBCM row
                (same generative function, N, and query set).
  --statespace  exact Matérn-3/2 GP at n=1M via the state-space
                parallel-scan path: adjoint-scan exact value+grad at
                the FULL n=1e6, plus (full mode) the value-only
                program, the reverse-AD cross-check at n/8 and the
                two-program smoothed posterior at 4096 query times;
                one JSON line.
  --grbcm-1m    BASELINE config 5, single-chip half: grBCM serving
                throughput at N=1M (2000 experts, T=L⁻¹ resident,
                experts streamed per query batch); one JSON line.
  --million     BASELINE config 5 correctness artifact: grBCM N=1M,
                experts sharded over the device mesh.  Run on CPU with
                8 virtual devices via
                  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
                (the committed artifact) or on a real multi-chip mesh.
"""

import json
import sys


def _main():
    args = sys.argv[1:]
    if "--million" in args:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags += " --xla_force_host_platform_device_count=8"
        if "xla_cpu_collective" not in flags:
            # 8 virtual devices share the host cores, so devices reach
            # each all-reduce minutes apart at N=1M — without this the
            # in-process communicator's 40 s rendezvous watchdog
            # aborts the run (rendezvous.cc "Termination timeout").
            flags += (
                " --xla_cpu_collective_timeout_seconds=3600"
                " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
            )
        os.environ["XLA_FLAGS"] = flags.strip()
        import jax

        platforms = jax.config.jax_platforms or ""
        if "axon" in platforms or platforms == "":
            # the 1M artifact is a mesh-correctness run; default to the
            # virtual CPU mesh unless real multi-chip hardware is up
            jax.config.update("jax_platforms", "cpu")
        from pygpr_tpu.bench import million_point_mesh_run

        print(json.dumps(million_point_mesh_run()), flush=True)
    elif "--large-n" in args:
        from pygpr_tpu.bench import bench_large_n

        print(json.dumps(bench_large_n()), flush=True)
    elif "--sgpr" in args:
        from pygpr_tpu.bench import bench_sgpr_large_n

        print(json.dumps(bench_sgpr_large_n()), flush=True)
    elif "--iterative" in args:
        from pygpr_tpu.bench import bench_iterative_large_n

        print(json.dumps(bench_iterative_large_n()), flush=True)
    elif "--statespace" in args:
        from pygpr_tpu.bench import bench_statespace_large

        print(json.dumps(bench_statespace_large()), flush=True)
    elif "--grbcm-1m" in args:
        from pygpr_tpu.bench import bench_grbcm_million_serving

        print(json.dumps(bench_grbcm_million_serving()), flush=True)
    else:
        from pygpr_tpu.bench import main

        main()


_main()
