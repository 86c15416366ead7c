"""Snippet generation (reference Q10, re-specified best-window)."""

from invertedindexbuilder_spark.operators.snippets import WINDOW, best_window


def test_best_window_prefers_highest_score():
    content = "x " * 300 + "hello world hello " + "y " * 300
    s, snip = best_window(content, ["hello", "world"])
    assert s == 3
    assert "hello world hello" in snip


def test_earliest_window_wins_ties():
    # two windows each containing one match; the FIRST must win
    content = "hello" + " " * (WINDOW - 5) + "pad " + "hello" + " " * 600
    s, snip = best_window(content, ["hello"])
    assert s == 1
    assert snip.startswith("hello")


def test_zero_score_and_empty():
    s, snip = best_window("nothing to see here", ["absent"])
    assert s == 0
    assert best_window("", ["x"]) == (0, "")


def test_case_insensitive_counting():
    s, _ = best_window("Hello HELLO hello.", ["hello"])
    assert s == 3
