"""Biological modality enums (triple_flow/1_config.py:57-79 capability):
route data through the right encoder/projection by declared type/scale."""

import enum


class BiologicalDataType(enum.Enum):
    PROTEIN = "protein"
    GENE = "gene"
    CELL_STATE = "cell_state"
    PERTURBATION = "perturbation"
    RNA_MOTIF = "rna_motif"


class BiologicalScale(enum.Enum):
    SINGLE_CELL = "single_cell"
    CELL_TYPE = "cell_type"
    TISSUE = "tissue"
