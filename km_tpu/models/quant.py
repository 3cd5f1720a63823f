"""Path expression quantification (least squares + projected gradient)
and the 12-column output row.

Numerics replicate km's PathQuant exactly so that the %.3f/%.1f-rounded
report fields are byte-identical (reference: km/utils/PathQuant.py:93-154):

- contribution matrix: int32 occurrence counts (+=1 per traversal, so ITD
  double-counted k-mers contribute 2);
- initial fit: np.linalg.lstsq over (int32, float32) -> float64;
- refinement: clamp negatives, step 0.1 * mean gradient, stop when
  max|grad| <= 0.01, with the gradient itself re-clamped before the test;
- rVAF = coef / sum(coef) (guarded when all-zero);
- pure-reference rows get rVAF = nan and coef = min(counts).

The batched jnp variant used by the TPU pipeline lives in
km_tpu.ops.nnls; it is validated against this host spec.
"""

from __future__ import annotations

import logging as log

import numpy as np


class PathQuant:
    def __init__(self, all_paths, counts):
        self.all_paths = all_paths
        self.nb_kmer = len(counts)
        self.nb_seq = len(all_paths)
        self.counts = np.array(counts, dtype=np.float32)
        self.contrib = np.zeros((self.nb_kmer, self.nb_seq), dtype=np.int32)
        for seq_i, seq in enumerate(all_paths):
            for i in seq:
                self.contrib[i, seq_i] += 1
        self.coef = None
        self.rVAF = None
        log.info("%d sequence(s) are observed.", self.nb_seq)

    def compute_coef(self):
        coef, _res, _rank, _sv = np.linalg.lstsq(self.contrib, self.counts,
                                                 rcond=None)
        self.coef = coef
        log.debug("Linear fitting = %s", self.coef)

    def refine_coef(self):
        self.coef[self.coef < 0] = 0
        last_max_grad = np.inf
        num_iter = 0
        while last_max_grad > 0.01:
            counts_hat = np.dot(self.contrib, self.coef)
            grad = 2 * (self.counts - counts_hat) * self.contrib.T
            grad = grad.sum(axis=1) / self.nb_kmer
            self.coef += 0.1 * grad
            grad[self.coef < 0] = 0
            self.coef[self.coef < 0] = 0
            last_max_grad = np.max(np.abs(grad))
            num_iter += 1
            log.debug("Iteration = %d, max_gradient = %f", num_iter,
                      last_max_grad)
        log.info("Refined fitting = %s", self.coef)

    def get_ratio(self):
        if max(self.coef) == 0:
            self.rVAF = self.coef
        else:
            self.rVAF = self.coef / np.sum(self.coef)
        return self.rVAF

    def adjust_for_reference(self):
        self.rVAF[0] = np.nan
        self.rVAF[1] = np.nan
        self.coef[self.coef >= 0] = min(self.counts)


class PathRow:
    """One output row of find_mutation (12 TSV columns; the variant_name
    slot carries an embedded tab splitting it into Type + Variant_name,
    matching km/utils/PathQuant.py:37-49)."""

    HEADER = "\t".join([
        "Database", "Query", "Type", "Variant_name", "rVAF", "Expression",
        "Min_coverage", "Start_offset", "Sequence", "Reference_expression",
        "Reference_sequence", "Info",
    ])

    def __init__(self, db_name, ref_name, variant_name, ratio, expression,
                 min_coverage, start_off, sequence, ref_ratio,
                 ref_expression, ref_sequence, note):
        self.db_name = db_name
        self.ref_name = ref_name
        self.variant_name = variant_name
        self.rVAF = ratio
        self.expression = expression
        self.min_coverage = min_coverage
        self.start_off = start_off
        self.sequence = sequence
        self.ref_ratio = ref_ratio
        self.ref_expression = ref_expression
        self.ref_sequence = ref_sequence
        self.note = note

    def __str__(self):
        return "%s\t%s\t%s\t%.3f\t%.1f\t%d\t%d\t%s\t%.1f\t%s\t%s" % (
            self.db_name, self.ref_name, self.variant_name, self.rVAF,
            self.expression, self.min_coverage, self.start_off,
            self.sequence, self.ref_expression, self.ref_sequence, self.note)

    @property
    def type(self) -> str:
        """Variant type (the Type column — first half of the embedded
        Type\\tVariant_name pair)."""
        return self.variant_name.split("\t")[0]

    def fields(self):
        return str(self).split("\t")

    def __getitem__(self, i):
        return self.fields()[i]
