"""Eigendecomposition parity: the closed-form invariants diagonalize the
true PDE Jacobians — L A = Lambda L for every model, axis, material
(the reference's GcmMatrices correctness, SURVEY.md §0.2)."""

import numpy as np
import pytest

from gcm_tpu.materials import IsotropicMaterial
from gcm_tpu.models.spec import get_model
from gcm_tpu.utils.linal import invariant_matrix, jacobian

MATS = [
    IsotropicMaterial.from_speeds(rho=1000.0, cp=1500.0),            # fluid
    IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0),  # rock
    IsotropicMaterial(rho=1200.0, lam=3.1e9, mu=0.9e9),
]

CASES = [
    ("acoustic1d", 0), ("acoustic2d", 0), ("acoustic2d", 1),
    ("acoustic3d", 2), ("elastic1d", 0),
    ("elastic2d", 0), ("elastic2d", 1),
    ("elastic3d", 0), ("elastic3d", 1), ("elastic3d", 2),
]


@pytest.mark.parametrize("model_name,axis", CASES)
@pytest.mark.parametrize("mat", MATS)
def test_left_eigenvectors(model_name, axis, mat):
    model = get_model(model_name)
    if model_name.startswith("acoustic") and mat.mu != 0:
        mat = IsotropicMaterial(rho=mat.rho, lam=mat.lam + 2 * mat.mu, mu=0.0)
    if model_name.startswith("elastic") and mat.mu == 0:
        pytest.skip("fluid limit covered separately")
    A = jacobian(model, mat, axis)
    L, lams = invariant_matrix(model, mat, axis)
    assert L.shape[0] == model.ncomp, "complete eigenbasis"
    assert abs(np.linalg.det(L)) > 1e-12, "invariants are independent"
    # each row is a left eigenvector: l A = lambda l
    resid = L @ A - np.diag(lams) @ L
    scale = np.abs(L @ A).max() + 1e-30
    assert np.abs(resid).max() / scale < 1e-12

    # eigenvalue multiset matches the analytic spectrum
    want = sorted(np.linalg.eigvals(A).real)
    got = sorted(lams)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-6 * max(mat.cp, 1))
