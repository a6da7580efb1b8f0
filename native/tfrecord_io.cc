// Native TFRecord I/O for the acgan data pipeline.
//
// The reference reads BAIR TFRecords through the TensorFlow runtime; this
// rebuild ships a dependency-free C++ reader/writer so the host input path
// never has to load TensorFlow (a ~13 s import on small TPU-VM hosts) and a
// schema-specific tf.train.Example parser for the BAIR per-timestep layout
// ({t}/<image_key>/encoded bytes, {t}/action floats, {t}/endeffector_pos
// floats — SURVEY.md §1).
//
// TFRecord framing: u64 length | u32 masked-crc32c(length) |
//                   payload     | u32 masked-crc32c(payload)
//
// Exposed as a C ABI consumed via ctypes (data/native_tfrecord.py).
//
// Build: make -C native   (produces libacgan_tfrecord.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <new>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), software table implementation.
// ---------------------------------------------------------------------------

namespace {

uint32_t g_crc_table[256];
bool g_crc_init = false;

void crc_init() {
  if (g_crc_init) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    g_crc_table[i] = c;
  }
  g_crc_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++)
    c = g_crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// TFRecord "masked" crc.
uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// Protobuf wire-format primitives (read side).
// ---------------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t b = *p++;
      v |= (uint64_t)(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  // Returns field number; wire type in *wt. 0 on end/error.
  uint32_t tag(uint32_t* wt) {
    if (p >= end) return 0;
    uint64_t t = varint();
    if (!ok) return 0;
    *wt = (uint32_t)(t & 7);
    return (uint32_t)(t >> 3);
  }

  bool skip(uint32_t wt) {
    switch (wt) {
      case 0: varint(); return ok;
      case 1: if (end - p < 8) return ok = false; p += 8; return true;
      case 2: {
        uint64_t n = varint();
        if (!ok || (uint64_t)(end - p) < n) return ok = false;
        p += n;
        return true;
      }
      case 5: if (end - p < 4) return ok = false; p += 4; return true;
      default: return ok = false;
    }
  }

  // Length-delimited subfield view.
  Cursor sub() {
    uint64_t n = varint();
    Cursor c{p, p, ok};
    if (!ok || (uint64_t)(end - p) < n) { c.ok = false; return c; }
    c.end = p + n;
    p += n;
    return c;
  }
};

// Extracted feature value (points into the record buffer).
struct FeatureView {
  const uint8_t* bytes = nullptr;  // BytesList[0]
  size_t bytes_len = 0;
  std::vector<float> floats;       // FloatList
  bool found = false;
};

// Parse a Feature message: 1=BytesList, 2=FloatList, 3=Int64List.
void parse_feature(Cursor c, FeatureView* out) {
  uint32_t wt;
  while (uint32_t f = c.tag(&wt)) {
    if (f == 1 && wt == 2) {  // BytesList { repeated bytes value = 1; }
      Cursor bl = c.sub();
      uint32_t wt2;
      while (uint32_t f2 = bl.tag(&wt2)) {
        if (f2 == 1 && wt2 == 2) {
          uint64_t n = bl.varint();
          if (!bl.ok || (uint64_t)(bl.end - bl.p) < n) return;
          out->bytes = bl.p;
          out->bytes_len = n;
          bl.p += n;
        } else if (!bl.skip(wt2)) return;
      }
    } else if (f == 2 && wt == 2) {  // FloatList { repeated float value = 1 [packed]; }
      Cursor fl = c.sub();
      uint32_t wt2;
      while (uint32_t f2 = fl.tag(&wt2)) {
        if (f2 == 1 && wt2 == 2) {  // packed
          Cursor pk = fl.sub();
          while (pk.ok && pk.end - pk.p >= 4) {
            float v;
            memcpy(&v, pk.p, 4);
            pk.p += 4;
            out->floats.push_back(v);
          }
        } else if (f2 == 1 && wt2 == 5) {  // unpacked
          if (fl.end - fl.p < 4) return;
          float v;
          memcpy(&v, fl.p, 4);
          fl.p += 4;
          out->floats.push_back(v);
        } else if (!fl.skip(wt2)) return;
      }
    } else if (!c.skip(wt)) {
      return;
    }
  }
  out->found = true;
}

// Find feature by key inside an Example record.
// Example { Features features = 1; }
// Features { map<string, Feature> feature = 1; }  (map entry: 1=key, 2=value)
bool find_feature(const uint8_t* rec, size_t len, const char* key, FeatureView* out) {
  size_t keylen = strlen(key);
  Cursor ex{rec, rec + len};
  uint32_t wt;
  while (uint32_t f = ex.tag(&wt)) {
    if (f == 1 && wt == 2) {
      Cursor feats = ex.sub();
      uint32_t wt2;
      while (uint32_t f2 = feats.tag(&wt2)) {
        if (f2 == 1 && wt2 == 2) {
          Cursor entry = feats.sub();
          const uint8_t* k = nullptr;
          size_t klen = 0;
          Cursor val{nullptr, nullptr};
          bool has_val = false;
          uint32_t wt3;
          while (uint32_t f3 = entry.tag(&wt3)) {
            if (f3 == 1 && wt3 == 2) {
              uint64_t n = entry.varint();
              if (!entry.ok || (uint64_t)(entry.end - entry.p) < n) break;
              k = entry.p;
              klen = n;
              entry.p += n;
            } else if (f3 == 2 && wt3 == 2) {
              val = entry.sub();
              has_val = true;
            } else if (!entry.skip(wt3)) {
              break;
            }
          }
          if (k && klen == keylen && memcmp(k, key, keylen) == 0 && has_val) {
            parse_feature(val, out);
            return out->found;
          }
        } else if (!feats.skip(wt2)) {
          return false;
        }
      }
    } else if (!ex.skip(wt)) {
      return false;
    }
  }
  return false;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Binary-contract version of this library. Bump whenever the exported
// function set or any argument/result semantics change; the Python loader
// refuses to run against a mismatched prebuilt .so (ADVICE r2: an mtime
// heuristic silently loaded old-semantics code when a rebuild failed).
//   v2: + acgan_abi_version, acgan_get_bytes, acgan_parse_clip_floats
//       (variable-length/compressed frame support).
int acgan_abi_version() { return 2; }

struct Reader {
  FILE* f;
  std::vector<uint8_t> buf;
};

Reader* acgan_reader_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  return new Reader{f, {}};
}

// Read next record; returns length or 0 on EOF, -1 on corruption.
// *data points into the reader's internal buffer (valid until next call).
long acgan_reader_next(Reader* r, const uint8_t** data) {
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, r->f) != 12) return 0;  // EOF
  uint64_t len;
  memcpy(&len, hdr, 8);
  uint32_t lcrc;
  memcpy(&lcrc, hdr + 8, 4);
  if (masked_crc(hdr, 8) != lcrc) return -1;
  // The length is untrusted even when its CRC checks out (corruption can
  // produce a self-consistent header). Cap it against the bytes actually
  // remaining in the file (payload + 4-byte data CRC must fit) and guard
  // the allocation: this is a C ABI entry point, so a bad_alloc escaping
  // here would std::terminate the host process instead of returning the
  // -1 corruption code (ADVICE r1).
  long pos = ftell(r->f);
  if (pos < 0 || fseek(r->f, 0, SEEK_END) != 0) return -1;
  long file_end = ftell(r->f);
  if (file_end < 0 || fseek(r->f, pos, SEEK_SET) != 0) return -1;
  uint64_t remaining = (uint64_t)(file_end - pos);
  if (remaining < 4 || len > remaining - 4) return -1;
  try {
    r->buf.resize(len);
  } catch (...) {
    return -1;
  }
  if (fread(r->buf.data(), 1, len, r->f) != len) return -1;
  uint8_t crcbuf[4];
  if (fread(crcbuf, 1, 4, r->f) != 4) return -1;
  uint32_t dcrc;
  memcpy(&dcrc, crcbuf, 4);
  if (masked_crc(r->buf.data(), len) != dcrc) return -1;
  *data = r->buf.data();
  return (long)len;
}

void acgan_reader_close(Reader* r) {
  if (r) {
    fclose(r->f);
    delete r;
  }
}

struct Writer {
  FILE* f;
};

Writer* acgan_writer_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  return new Writer{f};
}

int acgan_writer_write(Writer* w, const uint8_t* data, uint64_t len) {
  uint8_t hdr[12];
  memcpy(hdr, &len, 8);
  uint32_t lcrc = masked_crc(hdr, 8);
  memcpy(hdr + 8, &lcrc, 4);
  uint32_t dcrc = masked_crc(data, len);
  if (fwrite(hdr, 1, 12, w->f) != 12) return -1;
  if (fwrite(data, 1, len, w->f) != len) return -1;
  if (fwrite(&dcrc, 1, 4, w->f) != 4) return -1;
  return 0;
}

void acgan_writer_close(Writer* w) {
  if (w) {
    fclose(w->f);
    delete w;
  }
}

// Parse one BAIR-schema clip record into preallocated buffers:
//   frames : n_steps * frame_bytes  raw bytes (copied from BytesList[0])
//   actions: n_steps * action_dim  f32
//   states : n_steps * state_dim   f32   (state_dim 0 => skipped)
// Key layout: "<t>/<image_key>/encoded", "<t>/action", "<t>/endeffector_pos".
// Returns 0 on success, -(t+1) on the first missing/short timestep t.
// Zero-copy accessor for one bytes feature (e.g. a compressed frame whose
// length the fixed-size parse path cannot assume): *out points into the
// record buffer, valid as long as the buffer is. Returns 0 on success,
// -1 when the key is missing or holds no BytesList.
int acgan_get_bytes(const uint8_t* rec, uint64_t len, const char* key,
                    const uint8_t** out, uint64_t* out_len) {
  FeatureView v;
  if (!find_feature(rec, len, key, &v) || v.bytes == nullptr) return -1;
  *out = v.bytes;
  *out_len = v.bytes_len;
  return 0;
}

// Float-features-only variant of acgan_parse_clip (actions/states) for
// clips whose frames are compressed: the caller extracts frame bytes per
// timestep via acgan_get_bytes and decodes them host-side.
// Returns 0 on success, -(t+1) on the first missing/short timestep t.
int acgan_parse_clip_floats(const uint8_t* rec, uint64_t len, int n_steps,
                            float* actions, int action_dim,
                            float* states, int state_dim) {
  char key[256];
  for (int t = 0; t < n_steps; t++) {
    snprintf(key, sizeof(key), "%d/action", t);
    FeatureView act;
    if (!find_feature(rec, len, key, &act) || (int)act.floats.size() < action_dim)
      return -(t + 1);
    memcpy(actions + (uint64_t)t * action_dim, act.floats.data(),
           sizeof(float) * action_dim);
    if (state_dim > 0) {
      snprintf(key, sizeof(key), "%d/endeffector_pos", t);
      FeatureView st;
      if (!find_feature(rec, len, key, &st) || (int)st.floats.size() < state_dim)
        return -(t + 1);
      memcpy(states + (uint64_t)t * state_dim, st.floats.data(),
             sizeof(float) * state_dim);
    }
  }
  return 0;
}

int acgan_parse_clip(const uint8_t* rec, uint64_t len, int n_steps,
                     const char* image_key, uint64_t frame_bytes,
                     uint8_t* frames, float* actions, int action_dim,
                     float* states, int state_dim) {
  char key[256];
  for (int t = 0; t < n_steps; t++) {
    snprintf(key, sizeof(key), "%d/%s/encoded", t, image_key);
    FeatureView img;
    if (!find_feature(rec, len, key, &img) || img.bytes_len != frame_bytes)
      return -(t + 1);
    memcpy(frames + (uint64_t)t * frame_bytes, img.bytes, frame_bytes);

    snprintf(key, sizeof(key), "%d/action", t);
    FeatureView act;
    if (!find_feature(rec, len, key, &act) || (int)act.floats.size() < action_dim)
      return -(t + 1);
    memcpy(actions + (uint64_t)t * action_dim, act.floats.data(),
           sizeof(float) * action_dim);

    if (state_dim > 0) {
      snprintf(key, sizeof(key), "%d/endeffector_pos", t);
      FeatureView st;
      if (!find_feature(rec, len, key, &st) || (int)st.floats.size() < state_dim)
        return -(t + 1);
      memcpy(states + (uint64_t)t * state_dim, st.floats.data(),
             sizeof(float) * state_dim);
    }
  }
  return 0;
}

}  // extern "C"
