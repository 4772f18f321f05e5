"""Worker entry for the 2-process host-axis tests.

Launched as: python hostaxis_worker.py <case> <process_id> <nproc>
<port> <outdir>. Initializes jax.distributed over localhost (CPU
backend, gloo collectives), runs the requested case, and writes its
results to <outdir>/p<process_id>.pkl for the parent test to compare.
"""

import os
import pickle
import sys


def main() -> int:
    case, pid, nproc, port, outdir = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2"
                               ).strip()
    os.environ["DELLY_TPU_COORD"] = f"localhost:{port}"
    os.environ["DELLY_TPU_NPROC"] = str(nproc)
    os.environ["DELLY_TPU_PROC_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from delly_tpu.parallel import hostaxis
    assert hostaxis.maybe_init() == (nproc > 1)
    assert jax.process_index() == pid

    import numpy as np
    from delly_tpu.parallel import dispatch
    from delly_tpu.parallel.mesh import make_mesh

    out = {}
    if case == "primitives":
        # object exchange, ownership partition, writer gate
        got = hostaxis.allgather_obj({"pid": pid, "data": [pid] * 3})
        out["gather"] = got
        out["plan"] = hostaxis.partition_plan(list(range(7)))
        out["writer"] = hostaxis.is_writer()
        merged = hostaxis.exchange_owned(
            {k: f"p{pid}:{k}" for k in range(7)
             if hostaxis.owns(k)})
        out["merged"] = merged
    elif case == "kernels":
        # the production batched kernels over the GLOBAL mesh must
        # reproduce the single-device result on every process
        mesh = make_mesh(len(jax.devices()))
        rng = np.random.RandomState(7)
        n = 37
        q = rng.randint(0, 4, size=(n, 40)).astype(np.uint8) + 65
        t = rng.randint(0, 4, size=(n, 64)).astype(np.uint8) + 65
        ql = np.full(n, 40, dtype=np.int32)
        tl = np.full(n, 64, dtype=np.int32)
        from delly_tpu.ops.edist import MODE_HW
        d_mesh = dispatch.sharded_batched_edit_distance(
            mesh, q, ql, t, tl, MODE_HW)
        out["edist"] = np.asarray(d_mesh).tolist()

        from delly_tpu.parallel.depth_step import depth_windows_on_mesh
        w = 23
        covsum = rng.randint(0, 500, size=w).astype(np.float64)
        expcov = rng.uniform(10, 50, size=w)
        ok = rng.rand(w) > 0.2
        cn, logr, tot = depth_windows_on_mesh(
            mesh, covsum, expcov, ok, 2.0, 1.0, 2.0, 2.0)
        out["cnv"] = (cn.tolist(), logr.tolist(), tot)
    elif case == "sr_multi":
        # multi-contig mixed-SV genome (DEL/DUP/INV/INS per contig +
        # cross-contig BNDs): exercises real interval ownership,
        # cross-chromosome mate automata and tra-span parity replay
        import glob
        gen_dir = os.path.join(outdir, "data")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_multi_sv_dataset
            make_multi_sv_dataset(gen_dir)
        hostaxis.barrier("data")
        bam = glob.glob(os.path.join(gen_dir, "*.bam"))[0]
        fa = glob.glob(os.path.join(gen_dir, "*.fa"))[0]
        from delly_tpu import cli
        rc = cli.main(["sr", "-g", fa, "-o",
                       os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["nproc_seen"] = hostaxis.process_count()
    elif case == "sr_pair":
        # multi-sample sr (tumor + control BAMs) under the host axis:
        # per-file phase-A sharding + serial per-file replay
        gen_dir = os.path.join(outdir, "data")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_somatic_pair_dataset
            make_somatic_pair_dataset(gen_dir)
        hostaxis.barrier("data")
        tumor = os.path.join(gen_dir, "tumor.bam")
        control = os.path.join(gen_dir, "control.bam")
        fa = os.path.join(gen_dir, "som.fa")
        from delly_tpu import cli
        rc = cli.main(["sr", "-g", fa, "-o",
                       os.path.join(outdir, "out.vcf"), tumor,
                       control])
        out["rc"] = rc
    elif case == "sr_regeno":
        # -v re-genotyping under the host axis: discovery once on the
        # writer, then every process genotypes against the shared
        # sites with chromosome-owned decode + tape replay
        import glob
        gen_dir = os.path.join(outdir, "data")
        sites = os.path.join(outdir, "sites.bcf")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_multi_sv_dataset
            make_multi_sv_dataset(gen_dir)
        hostaxis.barrier("data")
        bam = glob.glob(os.path.join(gen_dir, "*.bam"))[0]
        fa = glob.glob(os.path.join(gen_dir, "*.fa"))[0]
        from delly_tpu import cli
        rc1 = cli.main(["sr", "-g", fa, "-o", sites, bam])
        hostaxis.barrier("sites")
        rc2 = cli.main(["sr", "-g", fa, "-v", sites, "-o",
                        os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc1 or rc2
        out["nproc_seen"] = hostaxis.process_count()
    elif case == "merge_gate":
        # merge is a single-process step: under a 2-process world only
        # process 0 executes and writes; process 1 waits at the barrier
        import glob
        gen_dir = os.path.join(outdir, "data")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_multi_sv_dataset
            make_multi_sv_dataset(gen_dir)
        hostaxis.barrier("data")
        bam = glob.glob(os.path.join(gen_dir, "*.bam"))[0]
        fa = glob.glob(os.path.join(gen_dir, "*.fa"))[0]
        from delly_tpu import cli
        disc = os.path.join(outdir, "disc.bcf")
        rc1 = cli.main(["sr", "-g", fa, "-o", disc, bam])
        merged = os.path.join(outdir, "merged.bcf")
        rc2 = cli.main(["merge", "-o", merged, disc])
        out["rc"] = rc1 or rc2
        out["merged_exists"] = os.path.exists(merged)
    elif case == "sr_path":
        # timed sr run on a pre-generated dataset (argv: fa bam)
        import time
        fa, bam = sys.argv[6], sys.argv[7]
        from delly_tpu import cli
        t0 = time.time()
        rc = cli.main(["sr", "-g", fa, "-o",
                       os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["wall"] = time.time() - t0
    elif case == "lr_path":
        # timed lr run on a pre-generated dataset (argv: fa bam)
        import time
        fa, bam = sys.argv[6], sys.argv[7]
        from delly_tpu import cli
        t0 = time.time()
        rc = cli.main(["lr", "-g", fa, "-o",
                       os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["wall"] = time.time() - t0
    elif case == "cnv_path":
        # timed cnv run on a pre-generated dataset (argv: fa bam)
        import time
        fa, bam = sys.argv[6], sys.argv[7]
        from delly_tpu import cli
        t0 = time.time()
        rc = cli.main(["cnv", "-g", fa,
                       "-c", os.path.join(outdir, "out.cov.gz"),
                       "-o", os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["wall"] = time.time() - t0
    elif case == "lr_multi":
        # long-read mixed-SV dataset (DEL/INS/DUP/INV + cross-contig
        # BND): exercises the lr scan/assembly/genotyping host axis
        # including the translocation attempt tape
        import glob
        gen_dir = os.path.join(outdir, "data")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_lr_sv_dataset
            make_lr_sv_dataset(gen_dir)
        hostaxis.barrier("data")
        bam = glob.glob(os.path.join(gen_dir, "*.bam"))[0]
        fa = glob.glob(os.path.join(gen_dir, "*.fa"))[0]
        from delly_tpu import cli
        rc = cli.main(["lr", "-g", fa, "-o",
                       os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["nproc_seen"] = hostaxis.process_count()
    elif case == "cnv_multi":
        # read-depth CNV over the multi-contig genome: 3 sharded read
        # passes (scan, gc-bias, count) + stitched covfile/VCF
        import glob
        gen_dir = os.path.join(outdir, "data")
        if hostaxis.is_writer():
            os.makedirs(gen_dir, exist_ok=True)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bamsynth import make_multi_sv_dataset
            make_multi_sv_dataset(gen_dir)
        hostaxis.barrier("data")
        bam = glob.glob(os.path.join(gen_dir, "*.bam"))[0]
        fa = glob.glob(os.path.join(gen_dir, "*.fa"))[0]
        from delly_tpu import cli
        rc = cli.main(["cnv", "-g", fa,
                       "-c", os.path.join(outdir, "out.cov.gz"),
                       "-o", os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["nproc_seen"] = hostaxis.process_count()
    elif case == "sr_e2e":
        # full sr pipeline through the CLI; process 0 writes the VCF
        ref = "/root/reference/example/ref.fa"
        bam = "/root/reference/example/sr.bam"
        from delly_tpu import cli
        rc = cli.main(["sr", "-g", ref, "-o",
                       os.path.join(outdir, "out.vcf"), bam])
        out["rc"] = rc
        out["nproc_seen"] = hostaxis.process_count()
    else:
        raise SystemExit(f"unknown case {case}")

    hostaxis.barrier("done")
    with open(os.path.join(outdir, f"p{pid}.pkl"), "wb") as fh:
        pickle.dump(out, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
