// rosbag v2.0 decoder -> packed sensor arrays.
//
// Native replacement for the reference's ingest stack: where MM-LOAM
// replays logs through `rosbag play` + roslaunch into ROS subscriber
// callbacks (README.md:48-57, unionLidarsAligner.cpp:127-139), this
// library parses the bag file directly and hands the Python data layer
// contiguous arrays (one ctypes call per topic), with no ROS dependency.
//
// Supports: bag format 2.0, uncompressed / lz4 / bz2 chunks (compression
// libraries are dlopen'ed so the build has no dev-package dependencies),
// message types sensor_msgs/Imu, sensor_msgs/PointCloud2,
// livox_ros_driver/CustomMsg (the three inputs of the reference pipeline).
//
// Build: cmake -S native -B native/build && cmake --build native/build

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// optional decompressors via dlopen
// ---------------------------------------------------------------------

using Lz4DecompressFn = int (*)(const char*, char*, int, int);
// bz2: int BZ2_bzBuffToBuffDecompress(char* dest, unsigned* destLen,
//                                     char* source, unsigned sourceLen,
//                                     int small, int verbosity);
using Bz2DecompressFn = int (*)(char*, unsigned*, char*, unsigned, int, int);

Lz4DecompressFn lz4_decompress() {
  static Lz4DecompressFn fn = [] {
    void* h = dlopen("liblz4.so.1", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("liblz4.so", RTLD_NOW | RTLD_GLOBAL);
    return h ? reinterpret_cast<Lz4DecompressFn>(dlsym(h, "LZ4_decompress_safe"))
             : nullptr;
  }();
  return fn;
}

Bz2DecompressFn bz2_decompress() {
  static Bz2DecompressFn fn = [] {
    void* h = dlopen("libbz2.so.1.0", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libbz2.so.1", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libbz2.so", RTLD_NOW | RTLD_GLOBAL);
    return h ? reinterpret_cast<Bz2DecompressFn>(
                   dlsym(h, "BZ2_bzBuffToBuffDecompress"))
             : nullptr;
  }();
  return fn;
}

// ---------------------------------------------------------------------
// little-endian readers
// ---------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  size_t n;
  bool ok = true;

  template <typename T>
  T read() {
    if (n < sizeof(T)) { ok = false; return T{}; }
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    n -= sizeof(T);
    return v;
  }
  bool skip(size_t k) {
    if (n < k) { ok = false; return false; }
    p += k; n -= k;
    return true;
  }
  std::string read_string() {
    uint32_t len = read<uint32_t>();
    if (!ok || n < len) { ok = false; return {}; }
    std::string s(reinterpret_cast<const char*>(p), len);
    p += len; n -= len;
    return s;
  }
};

struct Header {
  std::map<std::string, std::string> fields;

  bool parse(const uint8_t* p, size_t n) {
    while (n > 0) {
      if (n < 4) return false;
      uint32_t flen;
      std::memcpy(&flen, p, 4);
      p += 4; n -= 4;
      if (n < flen) return false;
      const uint8_t* eq =
          static_cast<const uint8_t*>(memchr(p, '=', flen));
      if (!eq) return false;
      fields[std::string(reinterpret_cast<const char*>(p), eq - p)] =
          std::string(reinterpret_cast<const char*>(eq + 1),
                      flen - (eq - p) - 1);
      p += flen; n -= flen;
    }
    return true;
  }
  template <typename T>
  bool get(const std::string& k, T* out) const {
    auto it = fields.find(k);
    if (it == fields.end() || it->second.size() != sizeof(T)) return false;
    std::memcpy(out, it->second.data(), sizeof(T));
    return true;
  }
  const std::string* str(const std::string& k) const {
    auto it = fields.find(k);
    return it == fields.end() ? nullptr : &it->second;
  }
};

struct MessageRef {
  uint32_t conn;
  double t;
  std::vector<uint8_t> data;   // serialized message body
};

struct Connection {
  std::string topic;
  std::string type;
};

struct Bag {
  std::map<uint32_t, Connection> conns;
  std::map<std::string, std::vector<size_t>> by_topic;  // -> msg indices
  std::vector<MessageRef> msgs;
  std::string error;
};

double ros_time(uint64_t raw) {
  uint32_t secs = static_cast<uint32_t>(raw & 0xFFFFFFFFu);
  uint32_t nsecs = static_cast<uint32_t>(raw >> 32);
  return double(secs) + double(nsecs) * 1e-9;
}

// parse a run of records (top level or inside a decompressed chunk)
bool parse_records(Bag* bag, const uint8_t* p, size_t n, bool inside_chunk);

bool parse_chunk(Bag* bag, const Header& h, const uint8_t* data, size_t n) {
  const std::string* comp = h.str("compression");
  uint32_t raw_size = 0;
  h.get("size", &raw_size);
  if (!comp || *comp == "none") {
    return parse_records(bag, data, n, true);
  }
  std::vector<uint8_t> out(raw_size);
  if (*comp == "lz4") {
    auto fn = lz4_decompress();
    if (!fn) { bag->error = "lz4 chunk but liblz4 unavailable"; return false; }
    int r = fn(reinterpret_cast<const char*>(data),
               reinterpret_cast<char*>(out.data()), int(n), int(raw_size));
    if (r < 0 || uint32_t(r) != raw_size) {
      bag->error = "lz4 decompression failed";
      return false;
    }
  } else if (*comp == "bz2") {
    auto fn = bz2_decompress();
    if (!fn) { bag->error = "bz2 chunk but libbz2 unavailable"; return false; }
    unsigned dlen = raw_size;
    if (fn(reinterpret_cast<char*>(out.data()), &dlen,
           const_cast<char*>(reinterpret_cast<const char*>(data)),
           unsigned(n), 0, 0) != 0 || dlen != raw_size) {
      bag->error = "bz2 decompression failed";
      return false;
    }
  } else {
    bag->error = "unknown chunk compression: " + *comp;
    return false;
  }
  return parse_records(bag, out.data(), out.size(), true);
}

bool parse_records(Bag* bag, const uint8_t* p, size_t n, bool inside_chunk) {
  while (n >= 8) {
    uint32_t hlen;
    std::memcpy(&hlen, p, 4);
    p += 4; n -= 4;
    if (n < hlen + 4) return false;
    Header h;
    if (!h.parse(p, hlen)) { bag->error = "bad record header"; return false; }
    p += hlen; n -= hlen;
    uint32_t dlen;
    std::memcpy(&dlen, p, 4);
    p += 4; n -= 4;
    if (n < dlen) return false;
    const uint8_t* data = p;
    p += dlen; n -= dlen;

    uint8_t op = 0;
    h.get("op", &op);
    switch (op) {
      case 0x07: {  // connection
        uint32_t conn = 0;
        h.get("conn", &conn);
        const std::string* topic = h.str("topic");
        Header ch;
        ch.parse(data, dlen);
        const std::string* type = ch.str("type");
        Connection c;
        c.topic = topic ? *topic : "";
        c.type = type ? *type : "";
        bag->conns[conn] = c;
        break;
      }
      case 0x02: {  // message data
        uint32_t conn = 0;
        uint64_t traw = 0;
        h.get("conn", &conn);
        h.get("time", &traw);
        MessageRef m;
        m.conn = conn;
        m.t = ros_time(traw);
        m.data.assign(data, data + dlen);
        bag->msgs.push_back(std::move(m));
        break;
      }
      case 0x05: {  // chunk
        if (!parse_chunk(bag, h, data, dlen)) return false;
        break;
      }
      default:
        break;  // bag header, index, chunk info: skipped
    }
  }
  return true;
}

// skip a ROS std_msgs/Header: seq u32, stamp u64, frame_id string
bool skip_ros_header(Cursor* c, double* stamp_out) {
  c->read<uint32_t>();
  uint64_t traw = c->read<uint64_t>();
  if (stamp_out) *stamp_out = ros_time(traw);
  c->read_string();
  return c->ok;
}

}  // namespace

// =====================================================================
// C API
// =====================================================================

extern "C" {

void* mm_bag_open(const char* path, char* err, int errlen) {
  FILE* f = fopen(path, "rb");
  auto fail = [&](const std::string& msg) -> void* {
    if (err && errlen > 0) snprintf(err, errlen, "%s", msg.c_str());
    if (f) fclose(f);
    return nullptr;
  };
  if (!f) return fail("cannot open file");
  char magic[16] = {0};
  if (!fgets(magic, sizeof(magic), f) ||
      std::strncmp(magic, "#ROSBAG V2.0", 12) != 0)
    return fail("not a rosbag 2.0 file");
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 13, SEEK_SET);
  std::vector<uint8_t> buf(sz - 13);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size())
    return fail("short read");
  fclose(f);
  f = nullptr;

  auto bag = std::make_unique<Bag>();
  if (!parse_records(bag.get(), buf.data(), buf.size(), false))
    return fail(bag->error.empty() ? "parse error" : bag->error);
  for (size_t i = 0; i < bag->msgs.size(); ++i) {
    auto it = bag->conns.find(bag->msgs[i].conn);
    if (it != bag->conns.end())
      bag->by_topic[it->second.topic].push_back(i);
  }
  return bag.release();
}

void mm_bag_close(void* h) { delete static_cast<Bag*>(h); }

int mm_bag_topic_count(void* h) {
  return int(static_cast<Bag*>(h)->by_topic.size());
}

int mm_bag_topic_info(void* h, int i, char* name, int nlen, char* type,
                      int tlen, long* count) {
  Bag* b = static_cast<Bag*>(h);
  int k = 0;
  for (auto& kv : b->by_topic) {
    if (k++ != i) continue;
    snprintf(name, nlen, "%s", kv.first.c_str());
    const Connection& c = b->conns[b->msgs[kv.second[0]].conn];
    snprintf(type, tlen, "%s", c.type.c_str());
    *count = long(kv.second.size());
    return 0;
  }
  return -1;
}

long mm_bag_message_count(void* h, const char* topic) {
  Bag* b = static_cast<Bag*>(h);
  auto it = b->by_topic.find(topic);
  return it == b->by_topic.end() ? 0 : long(it->second.size());
}

// Imu stream: fills t (M,), gyr (M,3), acc (M,3).  Returns count or -1.
long mm_bag_read_imu(void* h, const char* topic, double* t, double* gyr,
                     double* acc, long cap) {
  Bag* b = static_cast<Bag*>(h);
  auto it = b->by_topic.find(topic);
  if (it == b->by_topic.end()) return 0;
  long out = 0;
  for (size_t idx : it->second) {
    if (out >= cap) break;
    const MessageRef& m = b->msgs[idx];
    Cursor c{m.data.data(), m.data.size()};
    double stamp;
    if (!skip_ros_header(&c, &stamp)) return -1;
    c.skip(4 * 8 + 9 * 8);  // orientation + its covariance
    double w0 = c.read<double>(), w1 = c.read<double>(), w2 = c.read<double>();
    c.skip(9 * 8);
    double a0 = c.read<double>(), a1 = c.read<double>(), a2 = c.read<double>();
    if (!c.ok) return -1;
    t[out] = stamp;
    gyr[out * 3 + 0] = w0; gyr[out * 3 + 1] = w1; gyr[out * 3 + 2] = w2;
    acc[out * 3 + 0] = a0; acc[out * 3 + 1] = a1; acc[out * 3 + 2] = a2;
    ++out;
  }
  return out;
}

namespace {

struct PC2Field { std::string name; uint32_t offset; uint8_t dtype; };

bool pc2_layout(Cursor* c, double* stamp, uint32_t* width, uint32_t* height,
                std::vector<PC2Field>* fields, uint32_t* point_step,
                const uint8_t** data, uint32_t* data_len) {
  if (!skip_ros_header(c, stamp)) return false;
  *height = c->read<uint32_t>();
  *width = c->read<uint32_t>();
  uint32_t nf = c->read<uint32_t>();
  for (uint32_t i = 0; i < nf && c->ok; ++i) {
    PC2Field f;
    f.name = c->read_string();
    f.offset = c->read<uint32_t>();
    f.dtype = c->read<uint8_t>();
    c->read<uint32_t>();  // count
    fields->push_back(f);
  }
  c->read<uint8_t>();  // is_bigendian
  *point_step = c->read<uint32_t>();
  c->read<uint32_t>();  // row_step
  *data_len = c->read<uint32_t>();
  if (!c->ok || c->n < *data_len) return false;
  *data = c->p;
  return true;
}

float field_as_float(const uint8_t* p, uint8_t dtype) {
  switch (dtype) {
    case 1: return float(*reinterpret_cast<const int8_t*>(p));
    case 2: return float(*p);
    case 3: { int16_t v; std::memcpy(&v, p, 2); return float(v); }
    case 4: { uint16_t v; std::memcpy(&v, p, 2); return float(v); }
    case 5: { int32_t v; std::memcpy(&v, p, 4); return float(v); }
    case 6: { uint32_t v; std::memcpy(&v, p, 4); return float(v); }
    case 7: { float v; std::memcpy(&v, p, 4); return v; }
    case 8: { double v; std::memcpy(&v, p, 8); return float(v); }
    default: return 0.0f;
  }
}

}  // namespace

// PointCloud2 message `msg_idx` on `topic`: fills xyz (N,3), intensity (N,),
// ring (N,), time_rel (N,).  Missing fields are zero-filled.  Returns point
// count, -1 on error, -2 if cap too small (call with cap=0 to query size).
long mm_bag_pc2_points(void* h, const char* topic, long msg_idx,
                       double* stamp, float* xyz, float* intensity,
                       int32_t* ring, float* time_rel, long cap) {
  Bag* b = static_cast<Bag*>(h);
  auto it = b->by_topic.find(topic);
  if (it == b->by_topic.end() || msg_idx >= long(it->second.size()))
    return -1;
  const MessageRef& m = b->msgs[it->second[msg_idx]];
  Cursor c{m.data.data(), m.data.size()};
  uint32_t w, hh, step, dlen;
  std::vector<PC2Field> fields;
  const uint8_t* data;
  if (!pc2_layout(&c, stamp, &w, &hh, &fields, &step, &data, &dlen))
    return -1;
  long n = long(w) * long(hh);
  if (cap == 0) return n;
  if (n > cap) return -2;

  const PC2Field* fx = nullptr; const PC2Field* fy = nullptr;
  const PC2Field* fz = nullptr; const PC2Field* fi = nullptr;
  const PC2Field* fr = nullptr; const PC2Field* ft = nullptr;
  for (auto& f : fields) {
    if (f.name == "x") fx = &f;
    else if (f.name == "y") fy = &f;
    else if (f.name == "z") fz = &f;
    else if (f.name == "intensity") fi = &f;
    else if (f.name == "ring") fr = &f;
    else if (f.name == "time" || f.name == "t" || f.name == "timestamp" ||
             f.name == "time_offset") ft = &f;
  }
  if (!fx || !fy || !fz) return -1;
  // Hesai-style layouts stamp each point with an ABSOLUTE float64 time
  // (preprocess.h hesai_ros::Point).  Casting ~1.7e9 s epoch values to
  // f32 quantizes to ~256 s steps, destroying the per-point ordering the
  // undistortion needs — subtract the scan's first timestamp in f64
  // before narrowing.  Relative-time layouts (velodyne f32 `time`,
  // ouster u32 `t` nanoseconds) pass through unchanged; the python
  // decoder normalizes by span, so units cancel.
  double t0 = 0.0;
  if (ft && ft->dtype == 8 && n > 0)
    std::memcpy(&t0, data + ft->offset, 8);
  for (long i = 0; i < n; ++i) {
    const uint8_t* p = data + size_t(i) * step;
    xyz[i * 3 + 0] = field_as_float(p + fx->offset, fx->dtype);
    xyz[i * 3 + 1] = field_as_float(p + fy->offset, fy->dtype);
    xyz[i * 3 + 2] = field_as_float(p + fz->offset, fz->dtype);
    intensity[i] = fi ? field_as_float(p + fi->offset, fi->dtype) : 0.0f;
    ring[i] = fr ? int32_t(field_as_float(p + fr->offset, fr->dtype)) : -1;
    if (ft && ft->dtype == 8) {
      double tv;
      std::memcpy(&tv, p + ft->offset, 8);
      time_rel[i] = float(tv - t0);
    } else {
      time_rel[i] = ft ? field_as_float(p + ft->offset, ft->dtype) : 0.0f;
    }
  }
  return n;
}

double mm_bag_message_stamp(void* h, const char* topic, long msg_idx) {
  Bag* b = static_cast<Bag*>(h);
  auto it = b->by_topic.find(topic);
  if (it == b->by_topic.end() || msg_idx >= long(it->second.size()))
    return -1.0;
  return b->msgs[it->second[msg_idx]].t;
}

// livox CustomMsg `msg_idx`: fills xyz (N,3), reflect (N,), line (N,),
// offset_s (N,) [seconds since timebase].  Returns count / -1 / -2.
long mm_bag_livox_points(void* h, const char* topic, long msg_idx,
                         double* timebase_s, float* xyz, float* reflect,
                         int32_t* line, float* offset_s, long cap) {
  Bag* b = static_cast<Bag*>(h);
  auto it = b->by_topic.find(topic);
  if (it == b->by_topic.end() || msg_idx >= long(it->second.size()))
    return -1;
  const MessageRef& m = b->msgs[it->second[msg_idx]];
  Cursor c{m.data.data(), m.data.size()};
  if (!skip_ros_header(&c, nullptr)) return -1;
  uint64_t timebase = c.read<uint64_t>();
  uint32_t n = c.read<uint32_t>();
  c.read<uint8_t>();   // lidar_id
  c.skip(3);           // rsvd
  uint32_t npts = c.read<uint32_t>();  // points[] array length
  if (!c.ok || npts != n) {
    // some driver versions omit point_num == len; trust the array length
    n = npts;
  }
  if (cap == 0) return long(n);
  if (long(n) > cap) return -2;
  *timebase_s = double(timebase) * 1e-9;
  for (uint32_t i = 0; i < n; ++i) {
    uint32_t off = c.read<uint32_t>();
    float x = c.read<float>(), y = c.read<float>(), z = c.read<float>();
    uint8_t refl = c.read<uint8_t>();
    c.read<uint8_t>();  // tag
    uint8_t ln = c.read<uint8_t>();
    if (!c.ok) return -1;
    xyz[i * 3 + 0] = x; xyz[i * 3 + 1] = y; xyz[i * 3 + 2] = z;
    reflect[i] = float(refl);
    line[i] = ln;
    offset_s[i] = float(double(off) * 1e-9);
  }
  return long(n);
}

}  // extern "C"
