"""Unit tests for the pure math layer (SURVEY.md section 4 'unit layer'):
slab tests on known hit/miss/grazing rays, trilinear exactness at corners /
centers, camera ray geometry, noise determinism and range."""
import numpy as np
import jax.numpy as jnp

from volq.core.aabb import ray_aabb
from volq.core.camera import make_camera, pixel_rays
from volq.core.interp import sample_bank_trilinear
from volq.volume.noise import perlin3, perlin4, fbm3
from volq.volume.bake import bake_bank


class TestRayAABB:
    lo = jnp.array([-1.0, -1.0, -1.0])
    hi = jnp.array([1.0, 1.0, 1.0])

    def test_center_hit(self):
        t0, t1 = ray_aabb(jnp.array([0.0, 0.0, -5.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        assert np.isclose(t0, 4.0) and np.isclose(t1, 6.0)

    def test_miss(self):
        t0, t1 = ray_aabb(jnp.array([0.0, 5.0, -5.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        assert t1 <= t0

    def test_origin_inside(self):
        t0, t1 = ray_aabb(jnp.array([0.0, 0.0, 0.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        assert np.isclose(t0, 0.0) and np.isclose(t1, 1.0)

    def test_behind(self):
        t0, t1 = ray_aabb(jnp.array([0.0, 0.0, 5.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        assert t1 <= t0

    def test_axis_parallel_outside(self):
        # Ray parallel to x slab, outside it: must miss despite d.x == 0.
        t0, t1 = ray_aabb(jnp.array([2.0, 0.0, -5.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        assert t1 <= t0

    def test_grazing_corner(self):
        t0, t1 = ray_aabb(jnp.array([1.0, 1.0, -5.0]),
                          jnp.array([0.0, 0.0, 1.0]), self.lo, self.hi)
        # Exactly on the edge: either classification is fine, just no NaNs.
        assert np.isfinite(t0) and np.isfinite(t1)


class TestTrilinear:
    def test_corner_exact(self):
        V = 4
        vol = jnp.arange(V ** 3, dtype=jnp.float32).reshape(1, -1)
        # local coords of grid point (x=1, y=2, z=3) = indices / (V-1);
        # z-major layout: lin = (z*V + x)*V + y
        u = jnp.array([[1 / 3, 2 / 3, 1.0]])
        got = sample_bank_trilinear(vol, V, jnp.array([0]), u)
        want = (3 * V + 1) * V + 2
        assert np.isclose(float(got[0]), want, atol=1e-4)

    def test_cell_center_average(self):
        V = 2
        vol = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]])
        u = jnp.array([[0.5, 0.5, 0.5]])
        got = sample_bank_trilinear(vol, V, jnp.array([0]), u)
        assert np.isclose(float(got[0]), 3.5, atol=1e-5)

    def test_bank_rows(self):
        V = 2
        vol = jnp.stack([jnp.zeros(8), jnp.ones(8)])
        u = jnp.array([[0.3, 0.7, 0.5], [0.3, 0.7, 0.5]])
        got = sample_bank_trilinear(vol, V, jnp.array([0, 1]), u)
        assert np.isclose(float(got[0]), 0.0) and np.isclose(float(got[1]), 1.0)

    def test_clamps_outside(self):
        V = 4
        vol = jnp.ones((1, V ** 3))
        u = jnp.array([[-0.5, 1.5, 0.5]])
        got = sample_bank_trilinear(vol, V, jnp.array([0]), u)
        assert np.isfinite(float(got[0]))


class TestCamera:
    def test_persp_center_ray_is_forward(self):
        cam = make_camera((0, 0, -5), (0, 0, 0), (0, 1, 0), aspect=1.0)
        W = H = 4
        px = jnp.array([[1, 2]]); py = jnp.array([[1, 2]])
        o, d = pixel_rays(cam, px, py, W, H, "persp")
        assert np.allclose(np.asarray(o), [0, 0, -5])
        assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                           atol=1e-6)

    def test_ortho_rays_parallel(self):
        cam = make_camera((0, 0, -5), (0, 0, 0), (0, 1, 0),
                          projection="ortho", ortho_half_h=2.0)
        px = jnp.arange(4)[None, :]; py = jnp.zeros((1, 4), jnp.int32)
        o, d = pixel_rays(cam, px, py, 4, 4, "ortho")
        d = np.asarray(d)
        assert np.allclose(d, d[0, 0])
        o = np.asarray(o)
        assert not np.allclose(o[0, 0], o[0, 3])

    def test_image_y_down(self):
        cam = make_camera((0, 0, -5), (0, 0, 0), (0, 1, 0))
        px = jnp.array([0, 0]); py = jnp.array([0, 3])
        _, d = pixel_rays(cam, px, py, 4, 4, "persp")
        # smaller py = top of image = larger world y component
        assert float(d[0, 1]) > float(d[1, 1])


class TestNoise:
    def test_deterministic(self):
        p = jnp.array([[0.3, 1.7, -2.2], [5.5, 0.1, 9.9]])
        a = np.asarray(perlin3(p, 7))
        b = np.asarray(perlin3(p, 7))
        assert np.array_equal(a, b)

    def test_seed_changes_field(self):
        p = jnp.array([[0.3, 1.7, -2.2]])
        assert not np.isclose(float(perlin3(p, 7)[0]),
                              float(perlin3(p, 8)[0]))

    def test_zero_at_lattice(self):
        # Gradient noise is exactly zero at integer lattice points.
        p = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        assert np.allclose(np.asarray(perlin3(p, 3)), 0.0, atol=1e-6)

    def test_range(self):
        k = jnp.linspace(-8, 8, 24)
        p = jnp.stack(jnp.meshgrid(k, k, k, indexing="ij"), -1)
        n = np.asarray(fbm3(p, 5))
        assert n.min() > -1.5 and n.max() < 1.5
        assert n.std() > 0.05  # actually varies

    def test_perlin4_time_varies(self):
        p0 = jnp.array([[0.4, 0.6, 0.2, 0.0]])
        p1 = jnp.array([[0.4, 0.6, 0.2, 0.5]])
        assert not np.isclose(float(perlin4(p0, 2)[0]),
                              float(perlin4(p1, 2)[0]))

    def test_bake_properties(self):
        bank = np.asarray(bake_bank(2, 16, 9)).astype(np.float32)
        assert bank.shape == (2, 16, 16, 16)
        assert bank.min() >= 0.0 and bank.max() <= 1.0
        # falloff: the boundary shell is empty
        assert np.allclose(bank[:, 0], 0) and np.allclose(bank[:, -1], 0)
        # the two bank entries differ
        assert np.abs(bank[0] - bank[1]).max() > 0.05
