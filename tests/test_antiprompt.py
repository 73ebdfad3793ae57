"""Antiprompt tests, mirroring the reference's t-Antiprompt.cpp edge cases:
partial matches across chunks, restart on mismatch, substring overlap, reset,
multi-chunk stop strings."""

from blama_tpu.runtime.antiprompt import AntipromptManager, IncrementalStringFinder


def test_finder_simple_match():
    f = IncrementalStringFinder("stop")
    assert f.feed_text("please stop now") == 11  # index just past 'stop'


def test_finder_partial_across_feeds():
    f = IncrementalStringFinder("\nUser:")
    assert f.feed_text("hello\nUs") == -1
    assert f.feed_text("er") == -1
    assert f.feed_text(":") == 1


def test_finder_restart_on_mismatch():
    # The reference's restart is naive (not KMP): after matching "aa", the
    # 'a' that breaks "aab" resets to position 0 and only re-consumes one
    # character, so "aa"+"ab" does NOT match (IncrementalStringFinder.cpp:20-32).
    f = IncrementalStringFinder("aab")
    assert f.feed_text("aa") == -1
    assert f.feed_text("ab") == -1
    # whereas a clean single-feed occurrence does match
    f.reset()
    assert f.feed_text("xaab") == 4


def test_finder_empty_search():
    f = IncrementalStringFinder("")
    assert f.feed_text("anything") == -1


def test_finder_reset():
    f = IncrementalStringFinder("xyz")
    assert f.feed_text("xy") == -1
    f.reset()
    assert f.feed_text("z") == -1
    assert f.feed_text("xyz") == 3


def test_manager_match_includes_trailing_text():
    m = AntipromptManager()
    m.add_antiprompt("STOP")
    out = m.feed_generated_text("abc STOP trailing")
    assert out == "STOP trailing"


def test_manager_no_match():
    m = AntipromptManager()
    m.add_antiprompt("STOP")
    assert m.feed_generated_text("nothing here") == ""


def test_manager_multiple_antiprompts_earliest():
    m = AntipromptManager()
    m.add_antiprompt("BBB")
    m.add_antiprompt("AAA")
    out = m.feed_generated_text("xxAAAyy")
    assert out.startswith("AAA")


def test_manager_running_state():
    m = AntipromptManager()
    m.add_antiprompt("\nUser:")
    m.feed_generated_text("something\nUs")
    assert m.has_running_antiprompts()
    m.reset()
    assert not m.has_running_antiprompts()


def test_manager_multichunk_stream():
    m = AntipromptManager()
    m.add_antiprompt("\nUser:")
    chunks = ["Hello the", "re\n", "Use", "r", ": done"]
    result = ""
    for ch in chunks:
        result = m.feed_generated_text(ch)
        if result:
            break
    assert result == "\nUser: done"


def test_manager_case_sensitive():
    m = AntipromptManager()
    m.add_antiprompt("Stop")
    assert m.feed_generated_text("please stop") == ""
    assert m.feed_generated_text("please Stop") == "Stop"
