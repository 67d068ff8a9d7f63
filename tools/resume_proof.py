"""Kill-mid-wave resume proof at bench scale with the WARC sink on
(VERDICT r4 item 4): checkpoint-GC + incremental seen-set deltas + WARC
shard consistency together, proven by a scripted SIGKILL.

    python tools/resume_proof.py orchestrate [--seeds 1000000]

does, in fresh processes:

1. an uninterrupted reference crawl (WARC sink, checkpoint_every=1,
   checkpoint_keep=2 so GC runs, delta-chain seen snapshots);
2. a victim crawl with the same inputs, SIGKILL'd (the whole process
   group, raylet included) while a wave is in flight — detected by
   polling the output dir for wave dirs, then striking mid-wave;
3. a resume of the victim from its latest checkpoint;
4. record-level digests of both outputs: every WARC record (url,
   doc_id, payload sha1) and every CDX row (url, digest, length),
   order-insensitive, plus seen_total / docs / wave counts.

The proof passes iff the resumed victim's digests equal the reference's
— i.e. a hard mid-wave kill loses nothing and duplicates nothing, the
partial wave's WARC shards + CDX are cleanly replaced on resume, and
the restored delta-chain seen set admits exactly the same frontier.
Digests are record-level (not file-level) on purpose: shard names are
content-derived but record->shard grouping is executor-order dependent,
and the archival contract is about records.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _config(out_dir: str, ckpt_dir: str):
    from scraper_ray.crawl import CrawlConfig

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import crawl_bench_config

    web, pol = crawl_bench_config()
    return web, CrawlConfig(
        web=web, politeness=pol, out_dir=out_dir,
        checkpoint_dir=ckpt_dir, checkpoint_every=1, checkpoint_keep=2,
        checkpoint_full_every=5,        # delta-chain snapshots in play
        sink_format="warc",
        n_seen_shards=8, n_sched_shards=8, batch_size=2048)


def cmd_run(args) -> int:
    _init_ray()
    from scraper_ray.crawl import crawl
    from scraper_ray.synthweb import gen_seeds_dataset

    web, ccfg = _config(args.out, args.ckpt)
    seeds = gen_seeds_dataset(web, args.seeds).materialize()
    stats = crawl(seeds, ccfg)
    print(json.dumps({"docs": stats.docs, "waves": stats.waves,
                      "seen_total": stats.seen_total}))
    import ray

    ray.shutdown()
    return 0


def cmd_resume(args) -> int:
    _init_ray()
    from scraper_ray.crawl import crawl

    _, ccfg = _config(args.out, args.ckpt)
    stats = crawl(None, ccfg, resume=True)
    print(json.dumps({"docs": stats.docs, "waves_resumed": stats.waves,
                      "seen_total": stats.seen_total}))
    import ray

    ray.shutdown()
    return 0


def digest_output(out_dir: str) -> dict:
    """Record-level digests of a WARC crawl output tree."""
    _init_ray()
    import pyarrow.parquet as pq

    from scraper_ray.crawl import read_docs

    recs = []
    for b in read_docs(out_dir, format="warc").iter_batches(
            batch_format="pyarrow"):
        urls = b.column("url").to_pylist()
        dids = b.column("doc_id").to_pylist()
        pays = b.column("payload").to_pylist()
        recs += [(u, d, hashlib.sha1(
                      p if isinstance(p, bytes) else p.encode()).hexdigest())
                 for u, d, p in zip(urls, dids, pays)]
    recs.sort()
    warc_digest = hashlib.sha1(repr(recs).encode()).hexdigest()[:16]

    cdx_rows = []
    waves = sorted(n for n in os.listdir(out_dir) if n.startswith("wave="))
    for w in waves:
        cdx_dir = os.path.join(out_dir, w, "_cdx")
        if not os.path.isdir(cdx_dir):
            continue
        t = pq.read_table(cdx_dir)
        cdx_rows += list(zip(t.column("url").to_pylist(),
                             t.column("digest").to_pylist(),
                             t.column("length").to_pylist()))
    cdx_rows.sort()
    cdx_digest = hashlib.sha1(repr(cdx_rows).encode()).hexdigest()[:16]
    return {"n_records": len(recs), "n_distinct_urls": len({r[0] for r in recs}),
            "warc_digest": warc_digest,
            "n_cdx": len(cdx_rows), "cdx_digest": cdx_digest,
            "n_waves": len(waves)}


def cmd_digest(args) -> int:
    d = digest_output(args.out)
    print(json.dumps(d))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(d, f)
    import ray

    ray.shutdown()
    return 0


def _spawn(phase: str, out: str, ckpt: str, seeds: int,
           extra: list[str] | None = None) -> subprocess.Popen:
    cmd = [sys.executable, os.path.abspath(__file__), phase,
           "--out", out, "--ckpt", ckpt, "--seeds", str(seeds)]
    return subprocess.Popen(cmd + (extra or []), stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True,
                            start_new_session=True)  # own process group


def cmd_orchestrate(args) -> int:
    base = args.workdir
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    full_out, full_ck = f"{base}/full", f"{base}/full_ck"
    vic_out, vic_ck = f"{base}/victim", f"{base}/victim_ck"

    print(f"[1/4] reference run ({args.seeds} seeds, WARC sink)...",
          file=sys.stderr)
    t0 = time.time()
    p = _spawn("run", full_out, full_ck, args.seeds)
    out, _ = p.communicate()
    assert p.returncode == 0, "reference run failed"
    ref_stats = json.loads(out.strip().splitlines()[-1])
    ref_wall = time.time() - t0

    print("[2/4] victim run; SIGKILL mid-wave...", file=sys.stderr)
    from scraper_ray.crawl import latest_checkpoint

    p = _spawn("run", vic_out, vic_ck, args.seeds)
    # strike while a wave is in flight: wait until the checkpoint for
    # wave kill_after_waves-1 lands (so resume has a base), then a beat
    # into the NEXT wave, then SIGKILL the whole process group
    killed_at = None
    deadline = time.time() + max(120, ref_wall * 4)
    while time.time() < deadline and p.poll() is None:
        ck = latest_checkpoint(vic_ck)
        if ck is not None and ck >= args.kill_after_waves - 1:
            time.sleep(args.kill_delay)       # land inside the next wave
            killed_at = ck
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            break
        time.sleep(0.05)
    assert killed_at is not None, \
        "victim finished before the kill could land — raise --seeds"
    p.wait()
    last_ck = latest_checkpoint(vic_ck)
    print(f"    killed {args.kill_delay}s after checkpoint {killed_at}; "
          f"latest checkpoint on disk: wave {last_ck}", file=sys.stderr)
    assert last_ck is not None, "no checkpoint written before the kill"

    print("[3/4] resume victim from checkpoint...", file=sys.stderr)
    p = _spawn("resume", vic_out, vic_ck, args.seeds)
    out, _ = p.communicate()
    assert p.returncode == 0, "resume failed"
    res_stats = json.loads(out.strip().splitlines()[-1])
    assert res_stats["waves_resumed"] > 0, (
        "the kill landed after the final wave — the resume had nothing "
        "to do and the proof is vacuous; strike earlier "
        "(--kill-after-waves / --kill-delay) or raise --seeds")

    print("[4/4] digest + compare...", file=sys.stderr)
    ref_d = digest_output(full_out)
    vic_d = digest_output(vic_out)
    ok = (ref_d == vic_d
          and ref_stats["seen_total"] == res_stats["seen_total"]
          and ref_stats["docs"] == res_stats["docs"])
    verdict = {
        "ok": ok,
        "seeds": args.seeds,
        "reference": {**ref_stats, **ref_d, "wall_s": round(ref_wall, 1)},
        "resumed_victim": {**res_stats, **vic_d,
                           "killed_during": killed_at,
                           "resumed_from_wave": last_ck},
    }
    print(json.dumps(verdict))
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
    import ray

    ray.shutdown()
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="phase", required=True)
    for name in ("run", "resume", "digest"):
        s = sub.add_parser(name)
        s.add_argument("--out", required=True)
        s.add_argument("--ckpt", required=True)
        s.add_argument("--seeds", type=int, default=1_000_000)
        if name == "digest":
            s.add_argument("--json", default=None)
    o = sub.add_parser("orchestrate")
    o.add_argument("--seeds", type=int, default=1_000_000)
    o.add_argument("--workdir", default="/tmp/resume_proof")
    o.add_argument("--kill-after-waves", type=int, default=2)
    o.add_argument("--kill-delay", type=float, default=1.0)
    o.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    return {"run": cmd_run, "resume": cmd_resume, "digest": cmd_digest,
            "orchestrate": cmd_orchestrate}[args.phase](args)


if __name__ == "__main__":
    raise SystemExit(main())
