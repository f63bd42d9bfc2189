"""Vintaged-data container: snapshots, redaction, finals, CSV loading."""

import datetime as dt

import numpy as np
import pytest

from nowcastautogp_tpu.utils.data import VintagedData, load_vintaged_csv


def _make():
    # 3 reference weeks, reported over 3 report dates with upward revisions
    d = dt.date
    refs, reps, vals = [], [], []
    for i, ref in enumerate([d(2024, 1, 1), d(2024, 1, 8), d(2024, 1, 15)]):
        for j, rep in enumerate([d(2024, 1, 8), d(2024, 1, 15), d(2024, 1, 22)]):
            if rep >= ref + dt.timedelta(days=7):
                # value revises upward with each report
                vals.append(100 * (i + 1) + 10 * j)
                refs.append(ref)
                reps.append(rep)
    return VintagedData(refs, reps, vals)


class TestVintagedData:
    def test_snapshot_latest_wins(self):
        v = _make()
        ds, vals = v.snapshot(dt.date(2024, 1, 22))
        assert len(ds) == 3
        # latest report (j=2) for ref 0, j=1... per construction each ref's
        # last report has the largest value
        # each ref's latest report is j=2 -> value 100*(i+1) + 20
        assert vals[0] == 120
        assert vals[-1] == 320

    def test_snapshot_earlier_report(self):
        v = _make()
        ds, vals = v.snapshot(dt.date(2024, 1, 8))
        assert len(ds) == 1
        assert vals[0] == 100

    def test_confirmed_redacts(self):
        v = _make()
        ds_all, _ = v.snapshot(dt.date(2024, 1, 22))
        ds, vals = v.confirmed(dt.date(2024, 1, 22), n_redact=1)
        assert len(ds) == len(ds_all) - 1

    def test_provisional(self):
        v = _make()
        ds, vals = v.provisional(dt.date(2024, 1, 22), n_last=1)
        assert len(ds) == 1

    def test_final(self):
        v = _make()
        finals = v.final([dt.date(2024, 1, 1), dt.date(2024, 1, 8)])
        np.testing.assert_array_equal(finals, [120, 220])

    def test_final_with_unsorted_report_order(self):
        # rows arrive in arbitrary (here reversed) order: final() must use
        # the MAX report date, not the last row
        v = _make()
        order = np.arange(len(v.values))[::-1]
        shuffled = VintagedData(
            v.reference_dates[order], v.report_dates[order], v.values[order]
        )
        finals = shuffled.final([dt.date(2024, 1, 1), dt.date(2024, 1, 8)])
        np.testing.assert_array_equal(finals, [120, 220])

    def test_csv_round_trip(self, tmp_path):
        p = tmp_path / "vintage.csv"
        p.write_text(
            "reference_date,report_date,confirm\n"
            "2024-01-01,2024-01-08,100\n"
            "2024-01-01,2024-01-15,110\n"
            "2024-01-08,2024-01-15,200\n"
        )
        v = load_vintaged_csv(str(p))
        ds, vals = v.snapshot(dt.date(2024, 1, 15))
        np.testing.assert_array_equal(vals, [110, 200])
