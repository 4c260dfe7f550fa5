"""Scheduler CLI (C6): cron pattern parsing + next-fire computation.

Reference semantics: `lib/crawler/cli/schedule.rb:23-53` (rufus-scheduler
cron, vixie-cron field conventions, `overlap: false` via sequential fires).
"""

from datetime import datetime

import pytest

from crawler_spark.functions.cron import CronPattern


def test_every_minute():
    c = CronPattern("* * * * *")
    assert c.next_after(datetime(2026, 8, 17, 13, 0, 30)) == datetime(2026, 8, 17, 13, 1)


def test_fixed_daily():
    c = CronPattern("30 2 * * *")
    assert c.next_after(datetime(2026, 8, 17, 2, 30)) == datetime(2026, 8, 18, 2, 30)
    assert c.next_after(datetime(2026, 8, 17, 1, 0)) == datetime(2026, 8, 17, 2, 30)


def test_step_and_range():
    c = CronPattern("*/15 9-17 * * *")
    assert c.next_after(datetime(2026, 8, 17, 8, 50)) == datetime(2026, 8, 17, 9, 0)
    assert c.next_after(datetime(2026, 8, 17, 9, 1)) == datetime(2026, 8, 17, 9, 15)
    assert c.next_after(datetime(2026, 8, 17, 17, 46)) == datetime(2026, 8, 18, 9, 0)


def test_dow_sunday_both_forms():
    # 2026-08-17 is a Monday; next Sunday is 2026-08-23
    for dow in ("0", "7"):
        c = CronPattern(f"0 0 * * {dow}")
        assert c.next_after(datetime(2026, 8, 17, 0, 0)) == datetime(2026, 8, 23, 0, 0)


def test_vixie_dom_dow_union():
    # both restricted -> fires on day 20 OR on Friday (2026-08-21)
    c = CronPattern("0 0 20 * 5")
    assert c.next_after(datetime(2026, 8, 17, 0, 0)) == datetime(2026, 8, 20, 0, 0)
    assert c.next_after(datetime(2026, 8, 20, 0, 0)) == datetime(2026, 8, 21, 0, 0)


def test_month_rollover():
    c = CronPattern("0 0 1 1 *")  # Jan 1st
    assert c.next_after(datetime(2026, 8, 17, 0, 0)) == datetime(2027, 1, 1, 0, 0)


def test_month_list():
    c = CronPattern("0 12 1 3,9 *")
    assert c.next_after(datetime(2026, 8, 17, 0, 0)) == datetime(2026, 9, 1, 12, 0)


def test_leap_day():
    c = CronPattern("0 0 29 2 *")
    assert c.next_after(datetime(2026, 3, 1, 0, 0)) == datetime(2028, 2, 29, 0, 0)


def test_invalid_patterns():
    for bad in ("* * * *", "61 * * * *", "* 24 * * *", "* * 0 * *", "a * * * *"):
        with pytest.raises(ValueError):
            CronPattern(bad)


def test_matches_api():
    c = CronPattern("5 4 * * *")
    assert c.matches(datetime(2026, 8, 17, 4, 5))
    assert not c.matches(datetime(2026, 8, 17, 4, 6))
