// Native batch decoder for the feature store's google.protobuf.Struct wire
// format (parity role: the reference's C++ protobuf codegen, recflow_pb2 —
// Nexus/inference/embedder/recommendation/base.py:448-507 parses per-row
// protos in the serving hot path; this decoder parses a WHOLE batch of
// serialized Structs straight into caller-allocated int64 feature columns,
// no Python objects in the loop).
//
// Wire layout handled (proto3, google/protobuf/struct.proto):
//   Struct      { map<string, Value> fields = 1; }          tag 0x0A
//   FieldsEntry { string key = 1; Value value = 2; }        tags 0x0A, 0x12
//   Value       { null=1, double number_value=2 (0x11),
//                 string=3 (0x1A), bool=4 (0x20),
//                 Struct=5 (0x2A), ListValue=6 (0x32) }
//   ListValue   { repeated Value values = 1; }              tag 0x0A
//
// Numbers are doubles on the wire (Struct semantics); categorical ids decode
// exactly up to 2^53, cast to int64 by TRUNCATION toward zero — identical to
// the Python fallback's int() and the pre-native engines' int(row[feat]).
// bool_value decodes to 0/1 (also matching the fallback). Unknown keys and
// other value kinds are skipped. Lists longer than the column width are
// truncated, shorter ones leave the caller's zero-fill in place (the
// engines' padding convention).
//
// Build: g++ -O3 -shared -fPIC -o libfeature_codec.so feature_codec.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t b = *p++;
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  double fixed64_double() {
    if (end - p < 8) { ok = false; return 0.0; }
    double d;
    std::memcpy(&d, p, 8);
    p += 8;
    return d;
  }

  // skip one field with the given wire type
  void skip(uint32_t wire_type) {
    switch (wire_type) {
      case 0: varint(); break;                       // varint
      case 1: p = (end - p >= 8) ? p + 8 : end; break;  // fixed64
      case 2: {                                      // length-delimited
        uint64_t n = varint();
        p = (ok && static_cast<uint64_t>(end - p) >= n) ? p + n : end;
        break;
      }
      case 5: p = (end - p >= 4) ? p + 4 : end; break;  // fixed32
      default: ok = false; break;
    }
  }
};

// Parse a Value submessage holding a number or bool — returns true and
// writes the numeric value when one was found.
inline bool parse_number_value(Cursor c, double* out_number) {
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    uint32_t field = static_cast<uint32_t>(tag >> 3);
    uint32_t wt = static_cast<uint32_t>(tag & 7);
    if (field == 2 && wt == 1) {  // number_value
      *out_number = c.fixed64_double();
      return c.ok;
    }
    if (field == 4 && wt == 0) {  // bool_value
      *out_number = c.varint() ? 1.0 : 0.0;
      return c.ok;
    }
    c.skip(wt);
  }
  return false;
}

// Parse ListValue: repeated Value values = 1 — write up to `width` numbers.
inline int32_t parse_list_values(Cursor c, int64_t* out, int32_t width) {
  int32_t n = 0;
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    uint32_t field = static_cast<uint32_t>(tag >> 3);
    uint32_t wt = static_cast<uint32_t>(tag & 7);
    if (field == 1 && wt == 2) {
      uint64_t len = c.varint();
      if (!c.ok || static_cast<uint64_t>(c.end - c.p) < len) break;
      Cursor val{c.p, c.p + len};
      double d;
      if (n < width && parse_number_value(val, &d))
        out[n++] = static_cast<int64_t>(d);  // trunc: int() parity
      c.p += len;
    } else {
      c.skip(wt);
    }
  }
  return n;
}

struct Schema {
  // key -> field index; built once per decoder instance
  std::unordered_map<std::string, int32_t> index;
  std::vector<int32_t> widths;
};

}  // namespace

extern "C" {

// Opaque schema handle so the per-batch call does no string hashing setup.
void* fc_schema_create(const char* const* names, const int32_t* widths, int32_t n_fields) {
  auto* s = new Schema();
  s->widths.assign(widths, widths + n_fields);
  for (int32_t i = 0; i < n_fields; ++i) s->index.emplace(names[i], i);
  return s;
}

void fc_schema_destroy(void* schema) { delete static_cast<Schema*>(schema); }

// Decode n_rows serialized Structs (concatenated in blob_data, row i spanning
// [blob_offsets[i], blob_offsets[i+1])) into per-field int64 columns.
//   outs:    n_fields pointers, field f -> int64[n_rows * widths[f]] (zeroed)
//   lens:    int32[n_fields * n_rows] — written value count per row/field
// Returns number of rows successfully scanned.
int32_t fc_decode_batch(void* schema_handle,
                        const uint8_t* blob_data, const int64_t* blob_offsets,
                        int32_t n_rows,
                        int64_t* const* outs, int32_t* lens) {
  const Schema& schema = *static_cast<Schema*>(schema_handle);
  const int32_t n_fields = static_cast<int32_t>(schema.widths.size());
  std::string key;  // reused allocation
  int32_t done = 0;
  for (int32_t row = 0; row < n_rows; ++row) {
    Cursor c{blob_data + blob_offsets[row], blob_data + blob_offsets[row + 1]};
    while (c.ok && c.p < c.end) {
      uint64_t tag = c.varint();
      if (!c.ok) break;
      if ((tag >> 3) != 1 || (tag & 7) != 2) { c.skip(tag & 7); continue; }
      uint64_t entry_len = c.varint();
      if (!c.ok || static_cast<uint64_t>(c.end - c.p) < entry_len) break;
      Cursor e{c.p, c.p + entry_len};
      c.p += entry_len;

      key.clear();
      Cursor value_cur{nullptr, nullptr};
      while (e.ok && e.p < e.end) {
        uint64_t etag = e.varint();
        if (!e.ok) break;
        uint32_t ef = static_cast<uint32_t>(etag >> 3);
        uint32_t ew = static_cast<uint32_t>(etag & 7);
        if (ef == 1 && ew == 2) {  // key
          uint64_t klen = e.varint();
          if (!e.ok || static_cast<uint64_t>(e.end - e.p) < klen) break;
          key.assign(reinterpret_cast<const char*>(e.p), klen);
          e.p += klen;
        } else if (ef == 2 && ew == 2) {  // Value
          uint64_t vlen = e.varint();
          if (!e.ok || static_cast<uint64_t>(e.end - e.p) < vlen) break;
          value_cur = Cursor{e.p, e.p + vlen};
          e.p += vlen;
        } else {
          e.skip(ew);
        }
      }
      if (key.empty() || value_cur.p == nullptr) continue;
      auto it = schema.index.find(key);
      if (it == schema.index.end()) continue;
      const int32_t f = it->second;
      const int32_t width = schema.widths[f];
      int64_t* out_row = outs[f] + static_cast<int64_t>(row) * width;

      // inspect the Value: number (scalar) or list of numbers
      Cursor v = value_cur;
      while (v.ok && v.p < v.end) {
        uint64_t vtag = v.varint();
        if (!v.ok) break;
        uint32_t vf = static_cast<uint32_t>(vtag >> 3);
        uint32_t vw = static_cast<uint32_t>(vtag & 7);
        if (vf == 2 && vw == 1) {  // number_value
          out_row[0] = static_cast<int64_t>(v.fixed64_double());  // trunc
          lens[static_cast<int64_t>(f) * n_rows + row] = 1;
          break;
        } else if (vf == 4 && vw == 0) {  // bool_value -> 0/1 (int() parity)
          out_row[0] = static_cast<int64_t>(v.varint() != 0);
          lens[static_cast<int64_t>(f) * n_rows + row] = 1;
          break;
        } else if (vf == 6 && vw == 2) {  // list_value
          uint64_t llen = v.varint();
          if (!v.ok || static_cast<uint64_t>(v.end - v.p) < llen) break;
          lens[static_cast<int64_t>(f) * n_rows + row] =
              parse_list_values(Cursor{v.p, v.p + llen}, out_row, width);
          break;
        } else {
          v.skip(vw);
        }
      }
    }
    if (c.ok) ++done;
  }
  return done;
}

}  // extern "C"
