"""Unit tests for find_report's classification/canonicalization
internals at their decision boundaries (the fixture goldens cross these
paths but only at the fixtures' specific values; reference semantics:
km/tools/find_report.py:84-88,196-228)."""

from km_tpu.tools.find_report import (_dup_classify, _repeat_flanks,
                                      _slide_left)


class TestDupClassify:
    def test_exact_dup_3bp_is_itd(self):
        #         pos=6, insert TCG duplicates alt_seq[3:6]
        assert _dup_classify("TCG", "AAATCGTCGAAA", 6) == "ITD"

    def test_exact_dup_2bp_stays_insertion(self):
        # under the 3 bp minimum an exact duplication is NOT an ITD
        assert _dup_classify("TC", "AAATCTCAAA", 5) == "Insertion"

    def test_majority_match_is_iandi(self):
        # 3 of 4 bases match upstream (> 0.5)
        assert _dup_classify("TCGA", "AATCGGTCGAAA", 6) == "I&I"

    def test_half_match_is_insertion(self):
        # exactly 0.5 must NOT classify as I&I (strict >)
        assert _dup_classify("TCAA", "AATCGGTCAAXX", 6) == "Insertion"

    def test_insert_longer_than_upstream_is_insertion(self):
        # pos - len(insert) < 0: no room for a duplication upstream
        assert _dup_classify("TCGTC", "TCG", 2) == "Insertion"


class TestRepeatSliding:
    def test_slide_left_through_homopolymer(self):
        # inserting "A" into AAAA slides to the leftmost placement
        assert _slide_left("A", 4, "AAAAG") == 0

    def test_slide_left_no_repeat(self):
        assert _slide_left("T", 3, "ACGTG") == 2

    def test_repeat_flanks_symmetric(self):
        # GAT inserted inside a GATGAT repeat: flanks extend through
        # the repeated context on both sides
        ref = "CCGATGATCC"
        before, after, ib, ia = _repeat_flanks(ref, "GAT", 5, 5)
        assert ref[ib:5] == before
        # the window must stay inside the sequence and the flanks must
        # reproduce contiguous reference context
        assert ref.find(before) != -1 and ref.find(after) != -1
