"""Mueller/Stokes polarization calculus.

Parity: include/mitsuba/render/mueller.h:35-278 — depolarizer, absorber,
linear_polarizer, linear_retarder, right/left circular polarizers,
diattenuator, rotator, rotated_element, polarized specular
reflection/transmission (Fresnel with complex IOR), Stokes reference-basis
construction and rotation.

Representation: Mueller matrices are (..., 4, 4) arrays; when spectra carry
C channels the polarized spectrum is (..., 4, 4, C) (channel-last like the
reference's MuellerMatrix<Spectrum>). Stokes vectors are (..., 4[, C]).

Convention notes (matching the reference): Stokes bases are defined looking
*toward* the propagation direction ("from the sensor side"); basis x-axis =
horizontal linear polarization.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m


def _mm(rows):
    """Build a (..., 4, 4) matrix from 16 broadcastable entries."""
    rows = [[jnp.asarray(e, jnp.result_type(e, 1.0)) for e in r]
            for r in rows]
    flat = jnp.stack([jnp.stack(jnp.broadcast_arrays(*r), axis=-1)
                      for r in rows], axis=-2)
    return flat


def depolarizer(value=1.0):
    """Matrix that strips polarization, scaling intensity (mueller.h)."""
    v = jnp.asarray(value)
    out = jnp.zeros(v.shape + (4, 4), v.dtype)
    return out.at[..., 0, 0].set(v)


def absorber(value):
    """Neutral absorber: scales all components."""
    v = jnp.asarray(value)
    return jnp.eye(4, dtype=v.dtype) * v[..., None, None]


def linear_polarizer(value=1.0):
    """Ideal linear polarizer at 0 degrees (mueller.h linear_polarizer)."""
    a = 0.5 * jnp.asarray(value)
    z = jnp.zeros_like(a)
    return _mm([[a, a, z, z],
                [a, a, z, z],
                [z, z, z, z],
                [z, z, z, z]])


def linear_retarder(phase):
    """Linear retarder with fast axis horizontal (mueller.h
    linear_retarder); phase in radians (pi = half-wave plate)."""
    phase = jnp.asarray(phase, jnp.result_type(phase, 1.0))
    s = jnp.sin(phase)
    c = jnp.cos(phase)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    return _mm([[o, z, z, z],
                [z, o, z, z],
                [z, z, c, -s],
                [z, z, s, c]])


def right_circular_polarizer():
    return 0.5 * jnp.asarray([
        [1, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 1]],
        jnp.float32)


def left_circular_polarizer():
    return 0.5 * jnp.asarray([
        [1, 0, 0, -1], [0, 0, 0, 0], [0, 0, 0, 0], [-1, 0, 0, 1]],
        jnp.float32)


def diattenuator(x, y):
    """Linear diattenuator with transmittances x (horizontal), y (vertical)
    (mueller.h diattenuator)."""
    x = jnp.asarray(x, jnp.result_type(x, 1.0))
    y = jnp.asarray(y, x.dtype)
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = jnp.sqrt(x * y)
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z],
                [b, a, z, z],
                [z, z, c, z],
                [z, z, z, c]])


def rotator(theta):
    """Stokes basis rotation by theta (counter-clockwise looking toward the
    beam, mueller.h rotator)."""
    theta = jnp.asarray(theta, jnp.result_type(theta, 1.0))
    s = jnp.sin(2.0 * theta)
    c = jnp.cos(2.0 * theta)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    return _mm([[o, z, z, z],
                [z, c, s, z],
                [z, -s, c, z],
                [z, z, z, o]])


def rotated_element(theta, M):
    """Apply an optical element M rotated by theta (mueller.h
    rotated_element)."""
    Rp = rotator(theta)
    Rn = rotator(-theta)
    return Rp @ M @ Rn


# ----------------------------------------------------------------------------
# Polarized Fresnel (mueller.h specular_reflection / specular_transmission)
# ----------------------------------------------------------------------------

def _fresnel_amplitudes(cos_theta_i, eta_re, eta_im=None):
    """Complex s/p amplitude reflection coefficients (r_s, r_p) for an
    interface with (possibly complex) relative IOR."""
    ci = jnp.abs(jnp.asarray(cos_theta_i, jnp.result_type(cos_theta_i, 1.0)))
    si2 = 1.0 - ci * ci
    if eta_im is None:
        eta_im = jnp.zeros_like(jnp.asarray(eta_re, ci.dtype))
    eta = jnp.asarray(eta_re, ci.dtype) + 1j * jnp.asarray(eta_im, ci.dtype)
    eta = eta.astype(jnp.complex64)
    ct2 = jnp.sqrt((1.0 - si2 / (eta * eta)).astype(jnp.complex64))
    r_s = (ci - eta * ct2) / (ci + eta * ct2)
    r_p = (eta * ci - ct2) / (eta * ci + ct2)
    return r_s, r_p


def specular_reflection(cos_theta_i, eta_re, eta_im=None):
    """Mueller matrix of polarized specular reflection (mueller.h:~150).

    cos_theta_i > 0, eta = relative IOR (complex for conductors). The matrix
    is expressed in the standard s/p basis."""
    r_s, r_p = _fresnel_amplitudes(cos_theta_i, eta_re, eta_im)
    rs2 = jnp.abs(r_s) ** 2
    rp2 = jnp.abs(r_p) ** 2
    a = 0.5 * (rs2 + rp2)
    b = 0.5 * (rs2 - rp2)
    cross = r_s * jnp.conj(r_p)
    c = jnp.real(cross)
    s = jnp.imag(cross)
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z],
                [b, a, z, z],
                [z, z, c, s],
                [z, z, -s, c]]).real.astype(jnp.float32)


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of polarized specular transmission through a
    dielectric (mueller.h specular_transmission)."""
    ci = jnp.abs(jnp.asarray(cos_theta_i, jnp.result_type(cos_theta_i, 1.0)))
    eta = jnp.asarray(eta, ci.dtype)
    st2 = (1.0 - ci * ci) / (eta * eta)
    ct = m.safe_sqrt(1.0 - st2)
    t_s = 2.0 * ci / (ci + eta * ct)
    t_p = 2.0 * ci / (eta * ci + ct)
    # power normalization factor
    factor = eta * m.safe_div(ct, ci, 0.0)
    ts2 = factor * t_s * t_s
    tp2 = factor * t_p * t_p
    a = 0.5 * (ts2 + tp2)
    b = 0.5 * (ts2 - tp2)
    c = factor * t_s * t_p
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z],
                [b, a, z, z],
                [z, z, c, z],
                [z, z, z, c]])


# ----------------------------------------------------------------------------
# Stokes reference bases (mueller.h stokes_basis / rotate_*)
# ----------------------------------------------------------------------------

def stokes_basis(w):
    """A canonical horizontal axis for the Stokes basis perpendicular to
    propagation direction w (mueller.h stokes_basis)."""
    s, _ = m.coordinate_system(w)
    return s


def unit_angle(a, b):
    """Numerically robust angle between unit vectors (core/math.h
    unit_angle): 2*asin(|b-a|/2) avoids acos cancellation near 0/pi."""
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * m.norm(b - a), 0.0, 1.0))


def rotate_stokes_basis(w, basis_current, basis_target):
    """Rotator matrix aligning two Stokes bases around direction w
    (mueller.h rotate_stokes_basis)."""
    theta = unit_angle(m.normalize(basis_current), m.normalize(basis_target))
    # sign of rotation from the w axis orientation
    s = m.sign(m.dot(w, m.cross(basis_current, basis_target)))
    return rotator(theta * s)


def rotate_mueller_basis(M, in_w, in_basis_current, in_basis_target,
                         out_w, out_basis_current, out_basis_target):
    """Express M (defined for the 'current' in/out bases) in the 'target'
    bases (mueller.h rotate_mueller_basis)."""
    R_in = rotate_stokes_basis(in_w, in_basis_target, in_basis_current)
    R_out = rotate_stokes_basis(out_w, out_basis_current, out_basis_target)
    return R_out @ M @ R_in


def rotate_mueller_basis_collinear(M, w, basis_current, basis_target):
    R = rotate_stokes_basis(w, basis_target, basis_current)
    return rotate_stokes_basis(w, basis_current, basis_target) @ M @ R


def mueller_to_world(M, si, wo_local, wi_local):
    """Transform a Mueller matrix from the BSDF's local s/p frame to the
    world-aligned Stokes bases (role of si.to_world_mueller, used around
    every BSDF value in polarized variants, path.cpp:165,179)."""
    wi_world = si.to_world(wi_local)
    wo_world = si.to_world(wo_local)
    return rotate_mueller_basis(
        M,
        -wi_world, stokes_basis(-wi_world), stokes_basis(-wi_world),
        wo_world, stokes_basis(wo_world), stokes_basis(wo_world))


def to_world_mueller(si, M, in_forward_local, out_forward_local):
    """Re-express a Mueller matrix given w.r.t. the implicit local Stokes
    bases into the canonical world-direction bases
    (interaction.h to_world_mueller; applied around every BSDF value in
    polarized transport, path.cpp:165,179).

    in_forward_local: propagation direction of arriving light (local frame,
    usually -wo); out_forward_local: propagation direction of outgoing light
    (usually wi). M: (..., 4, 4) or (..., C, 4, 4)."""
    in_w = m.normalize(si.to_world(in_forward_local))
    out_w = m.normalize(si.to_world(out_forward_local))
    in_cur = m.normalize(si.to_world(stokes_basis(in_forward_local)))
    in_tgt = stokes_basis(in_w)
    out_cur = m.normalize(si.to_world(stokes_basis(out_forward_local)))
    out_tgt = stokes_basis(out_w)
    R_in = rotate_stokes_basis(in_w, in_tgt, in_cur)
    R_out = rotate_stokes_basis(out_w, out_cur, out_tgt)
    if M.ndim > R_in.ndim:  # (..., C, 4, 4): broadcast rotators over channels
        R_in = R_in[..., None, :, :]
        R_out = R_out[..., None, :, :]
    return R_out @ M @ R_in
