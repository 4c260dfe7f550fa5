#!/usr/bin/env python
"""`schedule` CLI: recurring crawls on a cron pattern (C6).

Reference: `lib/crawler/cli/schedule.rb:23-53` — rufus-scheduler cron with
``overlap: false``. Here the loop itself enforces non-overlap: each fire runs
the crawl job SYNCHRONOUSLY (one Spark application per fire, same
``spark-submit --py-files`` shape as jobs/submit_crawl.py), then schedules
from *now* — a crawl longer than the period simply skips the missed fires,
exactly what ``overlap: false`` gives rufus.

Usage:
    python jobs/schedule_crawl.py --pattern "*/30 * * * *" \
        --pages corpus.parquet --state /tmp/crawl_state \
        --seeds https://site0.test/ [--max-fires N] [submit_crawl args...]

``--max-fires`` (and ``--immediate``) exist for tests/smoke runs; the
production loop runs until terminated, like the reference.
"""

from __future__ import annotations

import argparse
import sys
import time
from datetime import datetime

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from crawler_spark.functions.cron import CronPattern  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description="recurring crawl scheduler")
    ap.add_argument("--pattern", required=True, help='5-field cron, e.g. "0 2 * * *"')
    ap.add_argument("--max-fires", type=int, default=0,
                    help="stop after N crawls (0 = run forever)")
    ap.add_argument("--immediate", action="store_true",
                    help="fire once immediately before honoring the pattern")
    args, crawl_argv = ap.parse_known_args(argv)

    from jobs.submit_crawl import main as run_crawl

    cron = CronPattern(args.pattern)
    print(f"Crawler initialized with a cron schedule of {args.pattern!r}", flush=True)
    fires = 0
    pending = args.immediate
    while True:
        if not pending:
            nxt = cron.next_after(datetime.now())
            wait = (nxt - datetime.now()).total_seconds()
            print(f"next scheduled crawl around {nxt:%Y-%m-%d %H:%M}", flush=True)
            if wait > 0:
                time.sleep(wait)
        pending = False
        print(f"Beginning scheduled crawl (actual trigger time: {datetime.now()})",
              flush=True)
        # resume-safe: every fire after the first reuses the state dir, so a
        # recurring schedule does primary+purge re-crawls over the same store
        run_crawl(crawl_argv)
        fires += 1
        print(f"Scheduled crawl ended at {datetime.now()}", flush=True)
        if args.max_fires and fires >= args.max_fires:
            return 0


if __name__ == "__main__":
    sys.exit(main())
