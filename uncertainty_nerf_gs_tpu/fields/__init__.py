"""Radiance fields: position+direction -> density / RGB / uncertainty."""

from uncertainty_nerf_gs_tpu.fields.nerfacto_field import (
    FieldOutputs,
    NerfactoField,
    ProposalDensityField,
)

__all__ = ["FieldOutputs", "NerfactoField", "ProposalDensityField"]
