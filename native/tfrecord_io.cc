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
// Performance notes (r3 rewrite; the r2 version measured 122 MB/s vs
// tf.data's 227 on the host reader bench):
//   * the reader mmaps the file (records are served zero-copy out of the
//     page cache; stdio with a 1 MB buffer is the fallback when mmap is
//     unavailable) and validates record lengths against a file size taken
//     ONCE at open — the r2 code paid two fseeks per record, which also
//     defeated stdio readahead;
//   * CRC32C uses the SSE4.2 hardware instruction when the CPU has it
//     (runtime-detected) and a slice-by-8 table otherwise — the r2 code was
//     byte-at-a-time;
//   * clip parsing walks the Example's feature map ONCE, dispatching each
//     entry by key — the r2 code re-scanned the whole record for every key
//     of every timestep (~3·T full scans per clip).
// Semantics (return codes, first-entry-wins on duplicate keys, error
// ordering by timestep) are unchanged; the ABI version stays at 2.
//
// Build: make -C native   (produces libacgan_tfrecord.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <new>
#include <string>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#define ACGAN_HAVE_MMAP 1
#endif

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli): SSE4.2 hardware path + slice-by-8 software fallback.
// ---------------------------------------------------------------------------

namespace {

uint32_t g_crc_table[8][256];

void crc_table_init() {
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    g_crc_table[0][i] = c;
  }
  for (int s = 1; s < 8; s++)
    for (uint32_t i = 0; i < 256; i++)
      g_crc_table[s][i] =
          (g_crc_table[s - 1][i] >> 8) ^ g_crc_table[0][g_crc_table[s - 1][i] & 0xFF];
}

// Initialized at dlopen time so no reader/writer call races the table build.
const bool g_crc_ready = (crc_table_init(), true);

// Slice-by-8 (little-endian hosts — x86-64 and aarch64 TPU VMs both are).
uint32_t crc32c_sw(const uint8_t* p, size_t n, uint32_t c) {
  (void)g_crc_ready;
  while (n >= 8) {
    uint64_t v;
    memcpy(&v, p, 8);
    v ^= c;
    c = g_crc_table[7][v & 0xFF] ^ g_crc_table[6][(v >> 8) & 0xFF] ^
        g_crc_table[5][(v >> 16) & 0xFF] ^ g_crc_table[4][(v >> 24) & 0xFF] ^
        g_crc_table[3][(v >> 32) & 0xFF] ^ g_crc_table[2][(v >> 40) & 0xFF] ^
        g_crc_table[1][(v >> 48) & 0xFF] ^ g_crc_table[0][(v >> 56) & 0xFF];
    p += 8;
    n -= 8;
  }
  while (n--) c = g_crc_table[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
  return c;
}

#if defined(__x86_64__)
__attribute__((target("sse4.2"))) uint32_t crc32c_hw(const uint8_t* p, size_t n,
                                                     uint32_t c) {
  uint64_t c64 = c;
  while (n >= 8) {
    uint64_t v;
    memcpy(&v, p, 8);
    c64 = __builtin_ia32_crc32di(c64, v);
    p += 8;
    n -= 8;
  }
  c = (uint32_t)c64;
  while (n--) c = __builtin_ia32_crc32qi(c, *p++);
  return c;
}

bool has_sse42() {
  static const bool v = __builtin_cpu_supports("sse4.2");
  return v;
}
#endif

uint32_t crc32c(const uint8_t* data, size_t n) {
  uint32_t c = 0xFFFFFFFFu;
#if defined(__x86_64__)
  if (has_sse42())
    c = crc32c_hw(data, n, c);
  else
#endif
    c = crc32c_sw(data, n, c);
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
  const uint8_t* bytes = nullptr;  // BytesList: last value wins (matches the
  size_t bytes_len = 0;            //   r1/r2 parser exactly)
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

// Parse a Feature's FloatList directly into dst (up to `dim` values),
// returning the TOTAL value count (so callers can enforce >= dim without a
// heap-allocated vector per feature). Returns -1 if the Feature message is
// structurally malformed, even when enough values were decoded before the
// bad field — matching the r2 parse_feature contract, which only reported
// found=true after the whole message parsed cleanly.
int parse_floats_into(Cursor c, float* dst, int dim) {
  int cnt = 0;
  uint32_t wt;
  while (uint32_t f = c.tag(&wt)) {
    if (f == 2 && wt == 2) {
      Cursor fl = c.sub();
      if (!fl.ok) return -1;
      uint32_t wt2;
      while (uint32_t f2 = fl.tag(&wt2)) {
        if (f2 == 1 && wt2 == 2) {  // packed
          Cursor pk = fl.sub();
          if (!pk.ok) return -1;
          while (pk.ok && pk.end - pk.p >= 4) {
            if (cnt < dim) memcpy(dst + cnt, pk.p, 4);
            pk.p += 4;
            cnt++;
          }
        } else if (f2 == 1 && wt2 == 5) {  // unpacked
          if (fl.end - fl.p < 4) return -1;
          if (cnt < dim) memcpy(dst + cnt, fl.p, 4);
          fl.p += 4;
          cnt++;
        } else if (!fl.skip(wt2)) {
          return -1;
        }
      }
      if (!fl.ok) return -1;
    } else if (!c.skip(wt)) {
      return -1;
    }
  }
  if (!c.ok) return -1;
  return cnt;
}

// Parse a Feature's BytesList; last value wins (parse_feature semantics).
// A structurally malformed message returns false even when an earlier value
// decoded cleanly (the r2 parse_feature set found only after a clean parse).
bool bytes_from_feature(Cursor c, const uint8_t** out, size_t* out_len) {
  bool found = false;
  uint32_t wt;
  while (uint32_t f = c.tag(&wt)) {
    if (f == 1 && wt == 2) {
      Cursor bl = c.sub();
      if (!bl.ok) return false;
      uint32_t wt2;
      while (uint32_t f2 = bl.tag(&wt2)) {
        if (f2 == 1 && wt2 == 2) {
          uint64_t n = bl.varint();
          if (!bl.ok || (uint64_t)(bl.end - bl.p) < n) return false;
          *out = bl.p;
          *out_len = n;
          bl.p += n;
          found = true;
        } else if (!bl.skip(wt2)) {
          return false;
        }
      }
      if (!bl.ok) return false;
    } else if (!c.skip(wt)) {
      return false;
    }
  }
  return found && c.ok;
}

// Find feature by key inside an Example record (kept for acgan_get_bytes —
// the per-timestep compressed-frame accessor, where one scan per call is
// fine because PIL decode dominates that path anyway).
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

// Single-pass BAIR-clip parse core: walk the feature map ONCE, dispatching
// each entry by its "<t>/<suffix>" key. frames == nullptr gives the
// floats-only variant. Error contract matches the r2 per-key scanner: the
// FIRST (lowest-t) timestep with a missing/short feature yields -(t+1);
// duplicate map keys keep the first entry (even if that entry is invalid).
int parse_clip_onepass(const uint8_t* rec, size_t len, int n_steps,
                       const char* image_key, uint64_t frame_bytes,
                       uint8_t* frames, float* actions, int action_dim,
                       float* states, int state_dim) {
  if (n_steps <= 0) return 0;
  const size_t iklen = (frames && image_key) ? strlen(image_key) : 0;
  // Per-(timestep, kind) first-entry + validity flags.
  std::vector<uint8_t> seen(3 * (size_t)n_steps, 0), got(3 * (size_t)n_steps, 0);
  enum { kFrame = 0, kAction = 1, kState = 2 };

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
          if (!k || !has_val) continue;
          // Key shape: "<decimal t>/<suffix>".
          size_t i = 0;
          long t = 0;
          bool dig = false, big = false;
          while (i < klen && k[i] >= '0' && k[i] <= '9') {
            if (!big) {
              t = t * 10 + (k[i] - '0');
              if (t >= n_steps) big = true;  // out of range: value irrelevant
            }
            dig = true;
            i++;
          }
          // Only the canonical decimal spelling matches (the r2 scanner
          // looked up snprintf("%d/...") keys exactly, so "07/action" must
          // NOT alias t=7).
          if (!dig || big || i >= klen || k[i] != '/') continue;
          if (i > 1 && k[0] == '0') continue;
          const uint8_t* sfx = k + i + 1;
          size_t sl = klen - i - 1;
          int kind = -1;
          if (sl == 6 && memcmp(sfx, "action", 6) == 0) {
            kind = kAction;
          } else if (state_dim > 0 && sl == 15 &&
                     memcmp(sfx, "endeffector_pos", 15) == 0) {
            kind = kState;
          } else if (frames && sl == iklen + 8 &&
                     memcmp(sfx, image_key, iklen) == 0 &&
                     memcmp(sfx + iklen, "/encoded", 8) == 0) {
            kind = kFrame;
          }
          if (kind < 0) continue;
          uint8_t* flag = &seen[(size_t)kind * n_steps + t];
          if (*flag) continue;  // first map entry wins
          *flag = 1;
          uint8_t* gf = &got[(size_t)kind * n_steps + t];
          if (kind == kFrame) {
            const uint8_t* b;
            size_t bl;
            if (bytes_from_feature(val, &b, &bl) && bl == frame_bytes) {
              memcpy(frames + (uint64_t)t * frame_bytes, b, frame_bytes);
              *gf = 1;
            }
          } else if (kind == kAction) {
            *gf = parse_floats_into(val, actions + (uint64_t)t * action_dim,
                                    action_dim) >= action_dim;
          } else {
            *gf = parse_floats_into(val, states + (uint64_t)t * state_dim,
                                    state_dim) >= state_dim;
          }
        } else if (!feats.skip(wt2)) {
          goto check;
        }
      }
    } else if (!ex.skip(wt)) {
      break;
    }
  }
check:
  for (int t = 0; t < n_steps; t++) {
    if ((frames && !got[(size_t)kFrame * n_steps + t]) ||
        !got[(size_t)kAction * n_steps + t] ||
        (state_dim > 0 && !got[(size_t)kState * n_steps + t]))
      return -(t + 1);
  }
  return 0;
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
//   (The r3 mmap/hw-CRC/one-pass rewrite changes no semantics: still v2.)
int acgan_abi_version() { return 2; }

struct Reader {
  // mmap path (preferred): records are served zero-copy from the mapping.
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  int fd = -1;
  // stdio fallback (mmap unavailable/failed).
  FILE* f = nullptr;
  std::vector<uint8_t> buf;
  // Shared: next-unread offset and the file size taken ONCE at open (the
  // reader assumes the file is not growing underneath it — training data is
  // static; the r2 code re-statted per record, costing two seeks each).
  // size_known guards the remaining-bytes corruption check: when the size
  // could not be determined (stdio fallback with a failed fseek/ftell,
  // e.g. a pipe), the check is skipped and short freads detect truncation
  // instead — ADVICE r3: an unknown size used to read as 0 and mis-report
  // EVERY record as corruption.
  size_t pos = 0;
  size_t file_size = 0;
  bool size_known = false;
};

Reader* acgan_reader_open(const char* path) {
#ifdef ACGAN_HAVE_MMAP
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  Reader* r = new (std::nothrow) Reader;
  if (!r) {
    close(fd);
    return nullptr;
  }
  // st_size is only meaningful for regular files — a FIFO/pipe/device
  // reports 0, and trusting it would make every record read as corruption
  // (the same bug the stdio #else branch fixed for a failed ftell, r4
  // review): leave size_known=false there so short freads detect EOF.
  if (S_ISREG(st.st_mode)) {
    r->file_size = (size_t)st.st_size;
    r->size_known = true;
  }
  if (r->size_known && st.st_size > 0) {
    void* m = mmap(nullptr, r->file_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m != MAP_FAILED) {
      madvise(m, r->file_size, MADV_SEQUENTIAL);
      r->map = (const uint8_t*)m;
      r->map_len = r->file_size;
      r->fd = fd;
      return r;
    }
  }
  FILE* f = fdopen(fd, "rb");
  if (!f) {
    close(fd);
    delete r;
    return nullptr;
  }
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  r->f = f;
  return r;
#else
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  Reader* r = new (std::nothrow) Reader;
  if (!r) {
    fclose(f);
    return nullptr;
  }
  if (fseek(f, 0, SEEK_END) == 0) {
    long e = ftell(f);
    if (e >= 0) {
      r->file_size = (size_t)e;
      r->size_known = true;
    }
    fseek(f, 0, SEEK_SET);
  }
  r->f = f;
  return r;
#endif
}

// Read next record; returns length or 0 on EOF, -1 on corruption.
// *data points into the mmap (or the reader's internal buffer on the stdio
// fallback) and stays valid until the next call (mmap: until close).
long acgan_reader_next(Reader* r, const uint8_t** data) {
  if (r->map) {
    // Fewer than 12 bytes left (including 0) is EOF, matching the stdio
    // short-fread semantics the tests pin for truncated files.
    if (r->file_size - r->pos < 12) return 0;
    const uint8_t* h = r->map + r->pos;
    uint64_t len;
    memcpy(&len, h, 8);
    uint32_t lcrc;
    memcpy(&lcrc, h + 8, 4);
    if (masked_crc(h, 8) != lcrc) return -1;
    // The length is untrusted even when its CRC checks out (corruption can
    // produce a self-consistent header): payload + 4-byte data CRC must fit
    // in the bytes actually remaining.
    uint64_t remaining = r->file_size - r->pos - 12;
    if (remaining < 4 || len > remaining - 4) return -1;
    const uint8_t* payload = h + 12;
    uint32_t dcrc;
    memcpy(&dcrc, payload + len, 4);
    if (masked_crc(payload, len) != dcrc) return -1;
    r->pos += 12 + len + 4;
    *data = payload;
    return (long)len;
  }
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, r->f) != 12) return 0;  // EOF
  r->pos += 12;
  uint64_t len;
  memcpy(&len, hdr, 8);
  uint32_t lcrc;
  memcpy(&lcrc, hdr + 8, 4);
  if (masked_crc(hdr, 8) != lcrc) return -1;
  if (r->size_known) {
    uint64_t remaining = r->file_size > r->pos ? r->file_size - r->pos : 0;
    if (remaining < 4 || len > remaining - 4) return -1;
  } else if (len > (1ull << 31)) {
    // No size to validate against: cap the length so a corrupt-but-
    // CRC-consistent header cannot trigger a multi-GB allocation; real
    // clip records are a few MB.
    return -1;
  }
  // Guard the allocation: this is a C ABI entry point, so a bad_alloc
  // escaping here would std::terminate the host process instead of
  // returning the -1 corruption code (ADVICE r1).
  try {
    r->buf.resize(len);
  } catch (...) {
    return -1;
  }
  if (fread(r->buf.data(), 1, len, r->f) != len) return -1;
  uint8_t crcbuf[4];
  if (fread(crcbuf, 1, 4, r->f) != 4) return -1;
  r->pos += len + 4;
  uint32_t dcrc;
  memcpy(&dcrc, crcbuf, 4);
  if (masked_crc(r->buf.data(), len) != dcrc) return -1;
  *data = r->buf.data();
  return (long)len;
}

void acgan_reader_close(Reader* r) {
  if (!r) return;
#ifdef ACGAN_HAVE_MMAP
  if (r->map) {
    munmap((void*)r->map, r->map_len);
    close(r->fd);
  }
#endif
  if (r->f) fclose(r->f);
  delete r;
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
  return parse_clip_onepass(rec, len, n_steps, nullptr, 0, nullptr, actions,
                            action_dim, states, state_dim);
}

// Parse one BAIR-schema clip record into preallocated buffers:
//   frames : n_steps * frame_bytes  raw bytes (copied from the BytesList)
//   actions: n_steps * action_dim  f32
//   states : n_steps * state_dim   f32   (state_dim 0 => skipped)
// Key layout: "<t>/<image_key>/encoded", "<t>/action", "<t>/endeffector_pos".
// Returns 0 on success, -(t+1) on the first missing/short timestep t.
int acgan_parse_clip(const uint8_t* rec, uint64_t len, int n_steps,
                     const char* image_key, uint64_t frame_bytes,
                     uint8_t* frames, float* actions, int action_dim,
                     float* states, int state_dim) {
  return parse_clip_onepass(rec, len, n_steps, image_key, frame_bytes, frames,
                            actions, action_dim, states, state_dim);
}

}  // extern "C"
