// aptd_native: native runtime pieces for ai_path_tracer_denoiser_tpu.
//
// The reference keeps its scene/OBJ loading and image writing native
// (scene.cpp + tiny_obj_loader, image.cpp + stb_image_write); this library is
// the equivalent for the TPU framework: a fast OBJ triangle loader (with the
// same pre-transform + load-or-recompute-normals semantics as
// scene.cpp:259-318) and a zlib PNG encoder (image.cpp:22-58 analogue).
// Exposed via a plain C ABI consumed by ctypes (utils/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}

inline Vec3 normalize(const Vec3 &v) {
  float n = std::sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
  if (n <= 0.f) return v;
  return {v.x / n, v.y / n, v.z / n};
}

// Fast float parse that tolerates leading whitespace.
inline const char *parse_float(const char *p, float *out) {
  char *end;
  *out = std::strtof(p, &end);
  return end;
}

}  // namespace

extern "C" {

// Parse an OBJ file into triangle soup.
//   transform16: row-major 4x4 applied to positions (normals left untouched,
//                matching the reference quirk at scene.cpp:302-307).
//   recompute_normals: ignore vn records, use geometric normals
//                      (cross(p2-p0, p1-p0) per scene.cpp:198-204).
// Returns the face count (>= 0) or -1 on error.  On success *out_verts and
// *out_norms hold malloc'd arrays of 9 floats per face (3 vertices x xyz);
// free them with aptd_free.
int aptd_obj_load(const char *path, const float *transform16,
                  int recompute_normals, float **out_verts,
                  float **out_norms) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  std::vector<Vec3> positions;
  std::vector<Vec3> normals;
  struct Ref { int v, n; };
  std::vector<Ref> tri_refs;  // 3 entries per triangle
  positions.reserve(1 << 16);
  tri_refs.reserve(1 << 17);

  const char *p = buf.data();
  const char *end = p + buf.size();
  std::vector<Ref> face;  // polygon scratch
  while (p < end) {
    // skip leading spaces
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p >= end) break;
    if (p[0] == 'v' && p + 1 < end && p[1] == ' ') {
      Vec3 v;
      p = parse_float(p + 2, &v.x);
      p = parse_float(p, &v.y);
      p = parse_float(p, &v.z);
      positions.push_back(v);
    } else if (p[0] == 'v' && p + 1 < end && p[1] == 'n') {
      Vec3 v;
      p = parse_float(p + 2, &v.x);
      p = parse_float(p, &v.y);
      p = parse_float(p, &v.z);
      normals.push_back(v);
    } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      face.clear();
      ++p;
      while (p < end && *p != '\n') {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        if (p >= end || *p == '\n') break;
        char *after;
        long vi = std::strtol(p, &after, 10);
        long ni = 0;
        p = after;
        if (p < end && *p == '/') {
          ++p;  // texcoord (maybe empty)
          while (p < end && *p != '/' && *p != ' ' && *p != '\n') ++p;
          if (p < end && *p == '/') {
            ni = std::strtol(p + 1, &after, 10);
            p = after;
          }
        }
        int v_res = vi > 0 ? static_cast<int>(vi - 1)
                           : static_cast<int>(positions.size() + vi);
        int n_res = ni > 0 ? static_cast<int>(ni - 1)
                           : (ni < 0 ? static_cast<int>(normals.size() + ni)
                                     : -1);
        face.push_back({v_res, n_res});
      }
      // triangle-fan
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        tri_refs.push_back(face[0]);
        tri_refs.push_back(face[k]);
        tri_refs.push_back(face[k + 1]);
      }
    }
    while (p < end && *p != '\n') ++p;
    ++p;
  }

  const int nf = static_cast<int>(tri_refs.size() / 3);
  float *verts = static_cast<float *>(std::malloc(sizeof(float) * 9 * nf));
  float *norms = static_cast<float *>(std::malloc(sizeof(float) * 9 * nf));
  if (!verts || !norms) {
    std::free(verts);
    std::free(norms);
    return -1;
  }

  const float *m = transform16;
  for (int fidx = 0; fidx < nf; ++fidx) {
    Vec3 world[3];
    bool have_normals = !recompute_normals && !normals.empty();
    for (int k = 0; k < 3; ++k) {
      const Ref &r = tri_refs[fidx * 3 + k];
      if (r.v < 0 || r.v >= static_cast<int>(positions.size())) {
        std::free(verts);
        std::free(norms);
        return -1;
      }
      const Vec3 &v = positions[r.v];
      Vec3 w;
      if (m) {
        w.x = m[0] * v.x + m[1] * v.y + m[2] * v.z + m[3];
        w.y = m[4] * v.x + m[5] * v.y + m[6] * v.z + m[7];
        w.z = m[8] * v.x + m[9] * v.y + m[10] * v.z + m[11];
      } else {
        w = v;
      }
      world[k] = w;
      verts[fidx * 9 + k * 3 + 0] = w.x;
      verts[fidx * 9 + k * 3 + 1] = w.y;
      verts[fidx * 9 + k * 3 + 2] = w.z;
      if (have_normals && r.n >= 0 &&
          r.n < static_cast<int>(normals.size())) {
        Vec3 nrm = normalize(normals[r.n]);
        norms[fidx * 9 + k * 3 + 0] = nrm.x;
        norms[fidx * 9 + k * 3 + 1] = nrm.y;
        norms[fidx * 9 + k * 3 + 2] = nrm.z;
      } else {
        have_normals = false;
      }
    }
    if (!(!recompute_normals && !normals.empty()) || !have_normals) {
      Vec3 e20 = {world[2].x - world[0].x, world[2].y - world[0].y,
                  world[2].z - world[0].z};
      Vec3 e10 = {world[1].x - world[0].x, world[1].y - world[0].y,
                  world[1].z - world[0].z};
      Vec3 g = normalize(cross(e20, e10));
      for (int k = 0; k < 3; ++k) {
        norms[fidx * 9 + k * 3 + 0] = g.x;
        norms[fidx * 9 + k * 3 + 1] = g.y;
        norms[fidx * 9 + k * 3 + 2] = g.z;
      }
    }
  }

  *out_verts = verts;
  *out_norms = norms;
  return nf;
}

void aptd_free(void *ptr) { std::free(ptr); }

namespace {

void put_u32be(std::vector<uint8_t> &out, uint32_t v) {
  out.push_back(v >> 24);
  out.push_back((v >> 16) & 0xFF);
  out.push_back((v >> 8) & 0xFF);
  out.push_back(v & 0xFF);
}

void put_chunk(std::vector<uint8_t> &out, const char tag[4],
               const uint8_t *payload, size_t len) {
  put_u32be(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), payload, payload + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_u32be(out, crc);
}

}  // namespace

// Write an 8-bit PNG (c = 1, 3 or 4 channels). Returns 0 on success.
int aptd_png_write(const char *path, const uint8_t *data, int w, int h,
                   int c) {
  if (c != 1 && c != 3 && c != 4) return -1;
  const uint8_t color_type = c == 1 ? 0 : (c == 3 ? 2 : 6);

  // filter type 0 per scanline
  const size_t stride = static_cast<size_t>(w) * c;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(&raw[y * (stride + 1) + 1], data + y * stride, stride);
  }

  uLongf comp_bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_bound);
  if (compress2(comp.data(), &comp_bound, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = (w >> 16) & 0xFF;
  ihdr[2] = (w >> 8) & 0xFF; ihdr[3] = w & 0xFF;
  ihdr[4] = h >> 24; ihdr[5] = (h >> 16) & 0xFF;
  ihdr[6] = (h >> 8) & 0xFF; ihdr[7] = h & 0xFF;
  ihdr[8] = 8; ihdr[9] = color_type; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", comp.data(), comp_bound);
  put_chunk(out, "IEND", nullptr, 0);

  FILE *f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t written = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return written == out.size() ? 0 : -1;
}

}  // extern "C"
