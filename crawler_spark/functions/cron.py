"""5-field cron pattern parsing + next-fire-time computation.

Backs the `schedule` CLI (reference: `lib/crawler/cli/schedule.rb:23-53`,
which delegates to rufus-scheduler's cron). Pure stdlib — the scheduler is
driver-side control flow, not a data-plane operator, so there is nothing to
distribute: one long-lived driver process launches one Spark crawl per fire,
sequentially (`overlap: false` semantics).

Fields: minute hour day-of-month month day-of-week, each `*`, `N`,
`A-B`, `*/S`, `A-B/S`, or comma lists thereof. Day-of-week 0-7 with both
0 and 7 meaning Sunday (the vixie-cron convention rufus follows). As in
vixie cron, when BOTH dom and dow are restricted the match is the union.
"""

from __future__ import annotations

from datetime import datetime, timedelta

_RANGES = {0: (0, 59), 1: (0, 23), 2: (1, 31), 3: (1, 12), 4: (0, 7)}


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"bad cron step: {step_s}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise ValueError(f"cron field value out of range [{lo},{hi}]: {part}")
        out.update(range(a, b + 1, step))
    return frozenset(out)


class CronPattern:
    def __init__(self, pattern: str):
        fields = pattern.split()
        if len(fields) != 5:
            raise ValueError(f"cron pattern needs 5 fields, got {len(fields)!r}: {pattern!r}")
        self.pattern = pattern
        self.minute, self.hour, self.dom, self.month, self.dow = (
            _parse_field(f, *_RANGES[i]) for i, f in enumerate(fields)
        )
        # normalize sunday: 7 -> 0
        if 7 in self.dow:
            self.dow = self.dow | {0}
        self.dom_restricted = self.dom != frozenset(range(1, 32))
        self.dow_restricted = (self.dow - {7}) != frozenset(range(0, 7))

    def _day_matches(self, t: datetime) -> bool:
        dom_ok = t.day in self.dom
        dow_ok = ((t.weekday() + 1) % 7) in self.dow  # python Mon=0 -> cron Sun=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # vixie union rule
        if self.dom_restricted:
            return dom_ok
        if self.dow_restricted:
            return dow_ok
        return True

    def matches(self, t: datetime) -> bool:
        return (
            t.minute in self.minute
            and t.hour in self.hour
            and t.month in self.month
            and self._day_matches(t)
        )

    def next_after(self, t: datetime) -> datetime:
        """First fire time strictly after ``t`` (minute granularity)."""
        cand = t.replace(second=0, microsecond=0) + timedelta(minutes=1)
        limit = cand + timedelta(days=366 * 4 + 1)  # any valid pattern fires within 4y
        while cand < limit:
            if cand.month not in self.month:
                # jump to the 1st of the next month
                nxt = (cand.replace(day=1) + timedelta(days=32)).replace(
                    day=1, hour=0, minute=0
                )
                cand = nxt
                continue
            if not self._day_matches(cand):
                cand = (cand + timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if cand.hour not in self.hour:
                cand = (cand + timedelta(hours=1)).replace(minute=0)
                continue
            if cand.minute not in self.minute:
                cand += timedelta(minutes=1)
                continue
            return cand
        raise ValueError(f"cron pattern never fires: {self.pattern!r}")
