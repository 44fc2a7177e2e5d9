"""Scalar numpy oracle: a direct reimplementation of the reference
renderer's semantics (/root/reference/src/Scene.h, Material.cpp, Sphere.h,
Square.h, Triangle.h, Functions.cpp) used as golden truth for the JAX
tracer. Deliberately written per-ray / per-object in plain numpy — slow,
simple, and structurally close to the C++ so semantic drift is obvious.

Stochastic draws go through an injectable `rand()` so deterministic test
configurations (radius-0 lights, mirror-only scenes, opaque shadows) are
exactly reproducible regardless of the stream.

Quirks intentionally preserved (see SURVEY.md §2.19):
- lights[0].material for every light; shadow factor multiplies the
  accumulated color; /MAXBOUNCES at the top; glass -0.6 fudge + inverted
  eta; mesh emission skipped; bounce-scaled skybox; cube-sampled "unit"
  vectors; strict-< closest-hit in (spheres, squares, meshes) order;
  sphere interior hits rejected; quads backface-culled unless glass;
  triangle t>=0 with scene-level eps cut of the *mesh closest* hit.
"""

from __future__ import annotations

import numpy as np

from tracer.scene.builder import (SceneBuilder, GLASS, MIRROR,
                                  TEX_CHECKERBOARD, TEX_IMAGE, TEX_NONE)

EPSILON = 1e-5
FLT_MAX = np.float32(3.4e38)
TRIANGLE_SCALING = 1.000001


def _norm(v):
    return v / max(np.linalg.norm(v), 1e-30)


def reflect(d, n):
    return d - 2.0 * np.dot(d, n) * n


def refract(d, n, eta):
    cos_theta = min(np.dot(d, n), 1.0)
    r_perp = eta * (d + cos_theta * n)
    r_par = -np.sqrt(abs(1.0 - np.dot(r_perp, r_perp))) * n
    return r_perp + r_par


def reflectance(cosine, ref_idx):
    r0 = ((1 - ref_idx) / (1 + ref_idx)) ** 2
    return r0 + (1 - r0) * (1 - cosine) ** 5


class Oracle:
    def __init__(self, sb: SceneBuilder, rand=None, nb_ech=10, bounces=6):
        self.sb = sb
        self.rand = rand or (lambda: np.random.rand())
        self.nb_ech = nb_ech
        self.bounces = bounces

    # ---- per-object intersections (reference semantics) -----------------
    def isect_sphere(self, s, o, d, time):
        tc = s.center + time * s.material.motion_blur_translation
        oc = o - tc
        a = np.dot(d, d)
        b = 2.0 * np.dot(d, oc)
        c = np.dot(oc, oc) - s.radius ** 2
        delta = b * b - 4 * a * c
        if delta < 0:
            return None
        t = (-b - np.sqrt(delta)) / (2 * a)
        if t < -EPSILON:
            return None
        p = o + t * d
        n = _norm(p - tc)
        theta = np.arccos(np.clip(-n[1], -1, 1))
        phi = np.arctan2(-n[2], n[0]) + np.pi
        return dict(t=t, p=p, n=n, theta=theta, phi=phi)

    def isect_quad(self, q, o, d, time):
        v = q.verts
        bl = v[0] + time * q.material.motion_blur_translation
        er = v[1] - v[0]
        eu = v[3] - v[0]
        n = _norm(np.cross(er, eu))
        dotRN = np.dot(d, n)
        if dotRN == 0:
            return None
        if dotRN > 0 and q.material.mtype != GLASS:
            return None
        D = np.dot(bl, n)
        t = (D - np.dot(o, n)) / dotRN
        if t < -EPSILON or t < EPSILON:
            return None
        p = o + t * d
        qq = p - bl
        lr = np.linalg.norm(er)
        lu = np.linalg.norm(eu)
        p1 = np.dot(qq, er) / lr
        p2 = np.dot(qq, eu) / lu
        if not (0 <= p1 <= lr and 0 <= p2 <= lu):
            return None
        return dict(t=t, p=p, n=n, u=p1 / lr, v=p2 / lu)

    def isect_mesh(self, m, o, d, time):
        """Brute force over scaled triangles — closest (strict <)."""
        best = None
        v = m.verts * TRIANGLE_SCALING
        for ti, tri in enumerate(m.tris):
            a, b, c = v[tri[0]], v[tri[1]], v[tri[2]]
            n = np.cross(b - a, c - a)
            ln = np.linalg.norm(n)
            if ln == 0:
                continue
            n = n / ln
            dotRN = np.dot(d, n)
            if dotRN >= 0:
                continue
            t = (np.dot(a, n) - np.dot(o, n)) / dotRN
            if t < 0:
                continue
            p = o + t * d
            v0, v1, v2 = b - a, c - a, p - a
            d00 = np.dot(v0, v0)
            d01 = np.dot(v0, v1)
            d11 = np.dot(v1, v1)
            d20 = np.dot(v2, v0)
            d21 = np.dot(v2, v1)
            den = d00 * d11 - d01 * d01
            if den == 0:
                continue
            w1 = (d11 * d20 - d01 * d21) / den
            w2 = (d00 * d21 - d01 * d20) / den
            w0 = 1 - w1 - w2
            if not all(0 <= w <= 1 for w in (w0, w1, w2)):
                continue
            if best is None or t < best["t"]:
                best = dict(t=t, p=p, n=n, w0=w0, w1=w1, w2=w2, ti=ti)
        return best

    # ---- scene intersection (Scene::computeIntersection) ----------------
    def compute_intersection(self, o, d, time, tmax=FLT_MAX):
        result = None
        t_best = tmax
        for i, s in enumerate(self.sb.spheres):
            h = self.isect_sphere(s, o, d, time)
            if h and EPSILON <= h["t"] < t_best:
                t_best = h["t"]
                result = ("sphere", i, h)
        for i, q in enumerate(self.sb.squares):
            h = self.isect_quad(q, o, d, time)
            if h and EPSILON <= h["t"] < t_best:
                t_best = h["t"]
                result = ("square", i, h)
        for i, m in enumerate(self.sb.meshes):
            h = self.isect_mesh(m, o, d, time)
            if h and EPSILON <= h["t"] < t_best:
                t_best = h["t"]
                result = ("mesh", i, h)
        return result

    # ---- shadows (Scene::computeShadow) ---------------------------------
    def compute_shadow(self, o, d, time, tmax):
        for s in self.sb.spheres:
            h = self.isect_sphere(s, o, d, time)
            if h and EPSILON <= h["t"] < tmax:
                if self.rand() > s.material.transparency:
                    return True
        for q in self.sb.squares:
            h = self.isect_quad(q, o, d, time)
            if h and EPSILON <= h["t"] < tmax:
                if self.rand() > q.material.transparency:
                    return True
        for m in self.sb.meshes:
            h = self.isect_mesh(m, o, d, time)
            if h and EPSILON <= h["t"] < tmax:
                if self.rand() > m.material.transparency:
                    return True
        return False

    # ---- texturing (Material::texture / sphere_texture) -----------------
    def texture(self, mat, u, v):
        if mat.texture_type == TEX_CHECKERBOARD:
            if int(u * mat.texture_scale_x) % 2 == int(v * mat.texture_scale_y) % 2:
                return mat.checkerboard_color1.copy()
            return mat.checkerboard_color2.copy()
        if mat.texture_type == TEX_IMAGE:
            img = (self.sb.textures[mat.texture_id]
                   if 0 <= mat.texture_id < len(self.sb.textures) else None)
            if img is None or img.shape[0] < 1 or img.shape[1] < 1:
                if int(u * 8) % 2 == int(v * 8) % 2:
                    return np.zeros(3)
                return np.array([1., 0., 1.])
            h, w = img.shape[:2]
            uu = np.fmod(u * mat.texture_scale_x, 1.0)
            vv = 1 - np.fmod(v * mat.texture_scale_y, 1.0)
            x = int(uu * (w - 1))
            y = int(vv * (h - 1))
            x = min(max(x, 0), w - 1)
            y = min(max(y, 0), h - 1)
            return img[y, x].astype(np.float64) / 255.0
        return None

    def emit(self, mat, u, v):
        if not mat.emissive:
            return np.zeros(3)
        if mat.texture_type == TEX_NONE:
            c = mat.light_color.astype(np.float64).copy()
        else:
            c = self.texture(mat, u, v)
        return c * mat.light_intensity

    def get_normal(self, mat, u, v, T, Bv, n):
        if mat.normal_map_id < 0:
            return n
        img = self.sb.normal_maps[mat.normal_map_id]
        if img is None:
            return n
        h, w = img.shape[:2]
        uu = np.fmod(u * mat.texture_scale_x, 1.0)
        vv = 1 - np.fmod(v * mat.texture_scale_y, 1.0)
        x = min(max(int(uu * (w - 1)), 0), w - 1)
        y = min(max(int(vv * (h - 1)), 0), h - 1)
        nm = img[y, x].astype(np.float64) / 127.5 - 1.0
        return _norm(nm[0] * T + nm[1] * Bv + nm[2] * n)

    def skybox(self, d, n_rem):
        sky = self.sb.skybox
        if sky is None:
            if self.sb.dark_sky:
                return np.zeros(3)
            a = 0.5 * (d[1] + 1.0)
            return ((1 - a) * np.ones(3)
                    + a * np.array([0.5, 0.7, 1.0]) * (n_rem + 1))
        h, w = sky.shape[:2]
        u = 0.5 + np.arctan2(d[2], d[0]) / (2 * np.pi)
        v = 0.5 - np.arcsin(np.clip(d[1], -1, 1)) / np.pi
        x = min(int(u * w), w - 1)
        y = min(int(v * h), h - 1)
        return sky[y, x].astype(np.float64) / 255.0 * n_rem

    # ---- scatter (Material::scatter) ------------------------------------
    def scatter(self, mat, d, n, p):
        if mat.mtype == GLASS:
            ri = 1.0 / mat.index_medium if np.dot(d, n) > 0 else mat.index_medium
            cos_t = min(np.dot(-d, n), 1.0)
            sin_t = np.sqrt(1 - cos_t * cos_t)
            cannot = (ri * sin_t) - 0.6 > 1.0
            if cannot or reflectance(cos_t, ri) > self.rand():
                nd = reflect(d, n)
            else:
                nd = refract(d, n, ri)
        elif mat.mtype == MIRROR:
            nd = reflect(d, n)
        else:
            ruv = _norm(np.array([self.rand() * 2 - 1 for _ in range(3)]))
            nd = n + ruv
            if np.linalg.norm(nd) <= EPSILON:
                nd = n
        nd = _norm(nd)
        return p + EPSILON * nd, nd

    def random_unit_vector(self):
        return _norm(np.array([self.rand() * 2 - 1 for _ in range(3)]))

    # ---- the recursive integrator (Scene::rayTraceRecursive) ------------
    def trace_recursive(self, o, d, time, n_rem):
        if n_rem == 0:
            return np.zeros(3)
        hit = self.compute_intersection(o, d, time)
        if hit is None:
            return self.skybox(d, n_rem)
        kind, idx, h = hit
        if kind == "sphere":
            obj = self.sb.spheres[idx]
            mat = obj.material
            p, n = h["p"], h["n"]
            diffuse = mat.diffuse.astype(np.float64).copy()
            tex = (self.texture(mat, h["phi"] / (2 * np.pi),
                                h["theta"] / np.pi)
                   if mat.texture_type != TEX_NONE else None)
            if tex is not None:
                diffuse = tex
            emission = self.emit(mat, h["phi"] / (2 * np.pi),
                                 h["theta"] / np.pi)
        elif kind == "square":
            obj = self.sb.squares[idx]
            mat = obj.material
            p, n = h["p"], h["n"]
            diffuse = mat.diffuse.astype(np.float64).copy()
            tex = self.texture(mat, h["u"], h["v"])
            if tex is not None:
                diffuse = tex
            n = self.get_normal(mat, h["u"], h["v"], obj.tangent,
                                obj.bitangent, n)
            emission = self.emit(mat, h["u"], h["v"])
        else:
            obj = self.sb.meshes[idx]
            mat = obj.material
            p, n = h["p"], h["n"]
            diffuse = mat.diffuse.astype(np.float64).copy()
            tri = obj.tris[h["ti"]]
            if obj.vert_colors is not None:
                diffuse = (h["w0"] * obj.vert_colors[tri[0]]
                           + h["w1"] * obj.vert_colors[tri[1]]
                           + h["w2"] * obj.vert_colors[tri[2]])
            elif obj.face_colors is not None:
                diffuse = obj.face_colors[h["ti"]].astype(np.float64).copy()
            emission = np.zeros(3)  # mesh emission skipped (Scene.h:287-299)

        color = np.zeros(3)
        for i, light in enumerate(self.sb.lights):
            L = _norm(light.pos - p)
            dotLN = np.dot(L, n)
            color += (self.sb.lights[0].color * diffuse
                      * max(0.0, dotLN) * (1.0 - mat.transparency))
            blocked = 0
            delta = light.radius / 2.0
            for _ in range(self.nb_ech):
                lp = light.pos + self.random_unit_vector() * delta
                L2 = _norm(lp - p)
                t_l = np.linalg.norm(lp - p)
                if self.compute_shadow(p + L2 * EPSILON, L2, time, t_l):
                    blocked += 1
            color *= 1.0 - blocked / self.nb_ech
        o2, d2 = self.scatter(mat, d, n, p)
        new_color = self.trace_recursive(o2, d2, time, n_rem - 1)
        return color + new_color * diffuse + emission

    def trace(self, o, d, time=0.0):
        return self.trace_recursive(np.asarray(o, np.float64),
                                    np.asarray(d, np.float64),
                                    time, self.bounces) / self.bounces
