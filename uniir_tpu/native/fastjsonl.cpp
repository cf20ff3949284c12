// fastjsonl: native host-side data-path for uniir_tpu.
//
// The reference stack leans on native code for its heavy lifting (FAISS for
// search, torch/NCCL for compute).  The TPU rebuild moves search onto the
// chip (Pallas) -- what remains hot on the HOST is the data path: parsing
// multi-million-line M-BEIR jsonl candidate pools (reference loads these with
// per-line python json.loads at every trainer/embedder start,
// src/data/mbeir_dataset.py:53-59) and an exact top-k for CPU-only
// environments (the FAISS fallback role).
//
// Exposes:
//   load_jsonl(path)                  -> list[dict]   (threaded parse)
//   topk(queries, pool, k)            -> (scores, indices)  (threaded, SIMD-friendly)
//
// Build: python setup.py build_ext --inplace   (see uniir_tpu/native/setup.py)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON value model + recursive-descent parser (UTF-8 passthrough).
// ---------------------------------------------------------------------------

struct JValue;
using JValuePtr = std::unique_ptr<JValue>;

struct JValue {
  enum class Kind { Null, Bool, Int, Double, Str, Arr, Obj } kind = Kind::Null;
  bool b = false;
  long long i = 0;
  double d = 0.0;
  std::string s;
  std::vector<JValuePtr> arr;
  std::vector<std::pair<std::string, JValuePtr>> obj;
};

class Parser {
 public:
  Parser(const char* p, const char* end) : p_(p), end_(end) {}

  JValuePtr Parse() {
    SkipWs();
    JValuePtr v = ParseValue();
    return v;
  }

  bool ok() const { return ok_; }
  const std::string& error() const { return error_; }

 private:
  const char* p_;
  const char* end_;
  bool ok_ = true;
  std::string error_;

  void Fail(const std::string& msg) {
    if (ok_) {
      ok_ = false;
      error_ = msg;
    }
  }

  void SkipWs() {
    while (p_ < end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r')) ++p_;
  }

  bool Consume(char c) {
    if (p_ < end_ && *p_ == c) {
      ++p_;
      return true;
    }
    return false;
  }

  JValuePtr ParseValue() {
    auto v = std::make_unique<JValue>();
    if (!ok_ || p_ >= end_) {
      Fail("unexpected end of input");
      return v;
    }
    switch (*p_) {
      case '{': return ParseObject();
      case '[': return ParseArray();
      case '"': {
        v->kind = JValue::Kind::Str;
        v->s = ParseString();
        return v;
      }
      case 't':
        if (end_ - p_ >= 4 && std::memcmp(p_, "true", 4) == 0) {
          p_ += 4;
          v->kind = JValue::Kind::Bool;
          v->b = true;
        } else Fail("bad literal");
        return v;
      case 'f':
        if (end_ - p_ >= 5 && std::memcmp(p_, "false", 5) == 0) {
          p_ += 5;
          v->kind = JValue::Kind::Bool;
          v->b = false;
        } else Fail("bad literal");
        return v;
      case 'n':
        if (end_ - p_ >= 4 && std::memcmp(p_, "null", 4) == 0) {
          p_ += 4;
          v->kind = JValue::Kind::Null;
        } else Fail("bad literal");
        return v;
      default: return ParseNumber();
    }
  }

  JValuePtr ParseObject() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Kind::Obj;
    Consume('{');
    SkipWs();
    if (Consume('}')) return v;
    while (ok_) {
      SkipWs();
      if (p_ >= end_ || *p_ != '"') {
        Fail("expected object key");
        break;
      }
      std::string key = ParseString();
      SkipWs();
      if (!Consume(':')) {
        Fail("expected ':'");
        break;
      }
      SkipWs();
      v->obj.emplace_back(std::move(key), ParseValue());
      SkipWs();
      if (Consume(',')) continue;
      if (Consume('}')) break;
      Fail("expected ',' or '}'");
    }
    return v;
  }

  JValuePtr ParseArray() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Kind::Arr;
    Consume('[');
    SkipWs();
    if (Consume(']')) return v;
    while (ok_) {
      SkipWs();
      v->arr.push_back(ParseValue());
      SkipWs();
      if (Consume(',')) continue;
      if (Consume(']')) break;
      Fail("expected ',' or ']'");
    }
    return v;
  }

  std::string ParseString() {
    std::string out;
    Consume('"');
    while (p_ < end_) {
      char c = *p_++;
      if (c == '"') return out;
      if (c != '\\') {
        out.push_back(c);
        continue;
      }
      if (p_ >= end_) break;
      char e = *p_++;
      switch (e) {
        case '"': out.push_back('"'); break;
        case '\\': out.push_back('\\'); break;
        case '/': out.push_back('/'); break;
        case 'b': out.push_back('\b'); break;
        case 'f': out.push_back('\f'); break;
        case 'n': out.push_back('\n'); break;
        case 'r': out.push_back('\r'); break;
        case 't': out.push_back('\t'); break;
        case 'u': {
          if (end_ - p_ < 4) {
            Fail("bad \\u escape");
            return out;
          }
          unsigned cp = 0;
          for (int k = 0; k < 4; ++k) {
            char h = p_[k];
            cp <<= 4;
            if (h >= '0' && h <= '9') cp |= h - '0';
            else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
            else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
            else {
              Fail("bad \\u escape");
              return out;
            }
          }
          p_ += 4;
          // surrogate pair
          if (cp >= 0xD800 && cp <= 0xDBFF && end_ - p_ >= 6 && p_[0] == '\\' && p_[1] == 'u') {
            unsigned lo = 0;
            bool okp = true;
            for (int k = 0; k < 4; ++k) {
              char h = p_[2 + k];
              lo <<= 4;
              if (h >= '0' && h <= '9') lo |= h - '0';
              else if (h >= 'a' && h <= 'f') lo |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') lo |= h - 'A' + 10;
              else { okp = false; break; }
            }
            if (okp && lo >= 0xDC00 && lo <= 0xDFFF) {
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
              p_ += 6;
            }
          }
          // encode UTF-8
          if (cp < 0x80) out.push_back(static_cast<char>(cp));
          else if (cp < 0x800) {
            out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
          } else if (cp < 0x10000) {
            out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
          } else {
            out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
          }
          break;
        }
        default:
          Fail("bad escape");
          return out;
      }
    }
    Fail("unterminated string");
    return out;
  }

  JValuePtr ParseNumber() {
    auto v = std::make_unique<JValue>();
    const char* start = p_;
    bool is_double = false;
    if (p_ < end_ && (*p_ == '-' || *p_ == '+')) ++p_;
    while (p_ < end_) {
      char c = *p_;
      if (c >= '0' && c <= '9') ++p_;
      else if (c == '.' || c == 'e' || c == 'E' || c == '-' || c == '+') {
        is_double = true;
        ++p_;
      } else break;
    }
    if (p_ == start) {
      Fail("bad number");
      return v;
    }
    std::string num(start, p_ - start);
    try {
      if (is_double) {
        v->kind = JValue::Kind::Double;
        v->d = std::stod(num);
      } else {
        v->kind = JValue::Kind::Int;
        v->i = std::stoll(num);
      }
    } catch (...) {
      Fail("bad number");
    }
    return v;
  }
};

// JValue -> Python object (requires the GIL).
PyObject* ToPy(const JValue& v) {
  switch (v.kind) {
    case JValue::Kind::Null: Py_RETURN_NONE;
    case JValue::Kind::Bool:
      if (v.b) Py_RETURN_TRUE;
      Py_RETURN_FALSE;
    case JValue::Kind::Int: return PyLong_FromLongLong(v.i);
    case JValue::Kind::Double: return PyFloat_FromDouble(v.d);
    case JValue::Kind::Str: return PyUnicode_FromStringAndSize(v.s.data(), v.s.size());
    case JValue::Kind::Arr: {
      PyObject* list = PyList_New(v.arr.size());
      if (!list) return nullptr;
      for (size_t i = 0; i < v.arr.size(); ++i) {
        PyObject* item = ToPy(*v.arr[i]);
        if (!item) {
          Py_DECREF(list);
          return nullptr;
        }
        PyList_SET_ITEM(list, i, item);
      }
      return list;
    }
    case JValue::Kind::Obj: {
      PyObject* dict = PyDict_New();
      if (!dict) return nullptr;
      for (const auto& kv : v.obj) {
        PyObject* key = PyUnicode_FromStringAndSize(kv.first.data(), kv.first.size());
        PyObject* val = ToPy(*kv.second);
        if (!key || !val || PyDict_SetItem(dict, key, val) != 0) {
          Py_XDECREF(key);
          Py_XDECREF(val);
          Py_DECREF(dict);
          return nullptr;
        }
        Py_DECREF(key);
        Py_DECREF(val);
      }
      return dict;
    }
  }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// load_jsonl(path): read the file, split lines, parse in parallel (GIL
// released), then build Python objects serially.
// ---------------------------------------------------------------------------

PyObject* LoadJsonl(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  std::string data;
  {
    FILE* f = std::fopen(path, "rb");
    if (!f) {
      PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
      return nullptr;
    }
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data.resize(static_cast<size_t>(size));
    if (size > 0 && std::fread(&data[0], 1, static_cast<size_t>(size), f) != static_cast<size_t>(size)) {
      std::fclose(f);
      PyErr_Format(PyExc_IOError, "short read on %s", path);
      return nullptr;
    }
    std::fclose(f);
  }

  // line boundaries
  std::vector<std::pair<const char*, const char*>> lines;
  {
    const char* p = data.data();
    const char* end = p + data.size();
    while (p < end) {
      const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
      const char* le = nl ? nl : end;
      // skip blank lines
      const char* q = p;
      while (q < le && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      if (q < le) lines.emplace_back(p, le);
      p = nl ? nl + 1 : end;
    }
  }

  std::vector<JValuePtr> parsed(lines.size());
  std::string first_error;
  std::atomic<long long> error_line{-1};
  {
    // parse with the GIL released
    Py_BEGIN_ALLOW_THREADS;
    unsigned n_threads = std::max(1u, std::min(std::thread::hardware_concurrency(), 16u));
    if (lines.size() < 1024) n_threads = 1;
    std::atomic<size_t> next{0};
    std::vector<std::thread> workers;
    for (unsigned t = 0; t < n_threads; ++t) {
      workers.emplace_back([&]() {
        size_t i;
        while ((i = next.fetch_add(64)) < lines.size()) {
          size_t hi = std::min(i + 64, lines.size());
          for (size_t j = i; j < hi; ++j) {
            Parser parser(lines[j].first, lines[j].second);
            parsed[j] = parser.Parse();
            if (!parser.ok()) {
              long long expected = -1;
              error_line.compare_exchange_strong(expected, static_cast<long long>(j));
            }
          }
        }
      });
    }
    for (auto& w : workers) w.join();
    Py_END_ALLOW_THREADS;
  }

  if (error_line.load() >= 0) {
    PyErr_Format(PyExc_ValueError, "invalid JSON on line %lld of %s", error_line.load() + 1, path);
    return nullptr;
  }

  PyObject* out = PyList_New(parsed.size());
  if (!out) return nullptr;
  for (size_t i = 0; i < parsed.size(); ++i) {
    PyObject* obj = ToPy(*parsed[i]);
    if (!obj) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, i, obj);
  }
  return out;
}

// ---------------------------------------------------------------------------
// topk(queries, pool, k): exact inner-product top-k on CPU.
// queries: float32 C-contiguous buffer [Q, D]; pool: float32 [N, D].
// Returns (scores float32 [Q, k] bytes, indices int64 [Q, k] bytes).
// ---------------------------------------------------------------------------

PyObject* TopK(PyObject*, PyObject* args) {
  // shapes passed explicitly: PyBUF_SIMPLE buffers carry no ndim/shape
  Py_buffer qbuf, pbuf;
  Py_ssize_t Q = 0, D = 0, N = 0, k = 0;
  if (!PyArg_ParseTuple(args, "y*nny*nn", &qbuf, &Q, &D, &pbuf, &N, &k)) return nullptr;

  struct BufGuard {
    Py_buffer* a;
    Py_buffer* b;
    ~BufGuard() {
      PyBuffer_Release(a);
      PyBuffer_Release(b);
    }
  } guard{&qbuf, &pbuf};

  if (static_cast<Py_ssize_t>(qbuf.len) != Q * D * 4 || static_cast<Py_ssize_t>(pbuf.len) != N * D * 4) {
    PyErr_SetString(PyExc_ValueError, "buffer sizes do not match the given shapes");
    return nullptr;
  }
  if (k <= 0 || k > N) {
    PyErr_SetString(PyExc_ValueError, "k out of range");
    return nullptr;
  }
  const float* q = static_cast<const float*>(qbuf.buf);
  const float* pool = static_cast<const float*>(pbuf.buf);

  std::vector<float> scores(static_cast<size_t>(Q) * k);
  std::vector<int64_t> indices(static_cast<size_t>(Q) * k);

  Py_BEGIN_ALLOW_THREADS;
  unsigned n_threads = std::max(1u, std::min(std::thread::hardware_concurrency(), 32u));
  std::atomic<Py_ssize_t> next{0};
  std::vector<std::thread> workers;
  for (unsigned t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      // per-thread running top-k as a min-heap laid out in plain arrays
      std::vector<float> heap_s(k);
      std::vector<int64_t> heap_i(k);
      Py_ssize_t qi;
      while ((qi = next.fetch_add(1)) < Q) {
        const float* qrow = q + qi * D;
        size_t filled = 0;
        auto sift_down = [&](size_t root) {
          while (true) {
            size_t l = 2 * root + 1, r = l + 1, smallest = root;
            if (l < filled && heap_s[l] < heap_s[smallest]) smallest = l;
            if (r < filled && heap_s[r] < heap_s[smallest]) smallest = r;
            if (smallest == root) break;
            std::swap(heap_s[root], heap_s[smallest]);
            std::swap(heap_i[root], heap_i[smallest]);
            root = smallest;
          }
        };
        for (Py_ssize_t n = 0; n < N; ++n) {
          const float* prow = pool + n * D;
          float dot = 0.f;
          for (Py_ssize_t dd = 0; dd < D; ++dd) dot += qrow[dd] * prow[dd];
          if (filled < static_cast<size_t>(k)) {
            heap_s[filled] = dot;
            heap_i[filled] = n;
            ++filled;
            if (filled == static_cast<size_t>(k)) {
              for (Py_ssize_t h = k / 2 - 1; h >= 0; --h) sift_down(h);
            }
          } else if (dot > heap_s[0]) {
            heap_s[0] = dot;
            heap_i[0] = n;
            sift_down(0);
          }
        }
        if (filled < static_cast<size_t>(k)) {
          for (Py_ssize_t h = static_cast<Py_ssize_t>(filled) / 2 - 1; h >= 0; --h) sift_down(h);
        }
        // heap -> descending order
        std::vector<std::pair<float, int64_t>> sorted(filled);
        for (size_t h = 0; h < filled; ++h) sorted[h] = {heap_s[h], heap_i[h]};
        std::sort(sorted.begin(), sorted.end(), [](auto& a, auto& b) { return a.first > b.first; });
        for (Py_ssize_t h = 0; h < k; ++h) {
          scores[qi * k + h] = sorted[h].first;
          indices[qi * k + h] = sorted[h].second;
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  Py_END_ALLOW_THREADS;

  PyObject* s_bytes = PyBytes_FromStringAndSize(reinterpret_cast<const char*>(scores.data()),
                                                scores.size() * sizeof(float));
  PyObject* i_bytes = PyBytes_FromStringAndSize(reinterpret_cast<const char*>(indices.data()),
                                                indices.size() * sizeof(int64_t));
  if (!s_bytes || !i_bytes) {
    Py_XDECREF(s_bytes);
    Py_XDECREF(i_bytes);
    return nullptr;
  }
  PyObject* tup = PyTuple_Pack(2, s_bytes, i_bytes);
  Py_DECREF(s_bytes);
  Py_DECREF(i_bytes);
  return tup;
}

PyMethodDef Methods[] = {
    {"load_jsonl", LoadJsonl, METH_VARARGS, "Parse a jsonl file into a list of python objects (threaded)."},
    {"topk", TopK, METH_VARARGS, "Exact inner-product top-k over float32 buffers (threaded)."},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef Module = {PyModuleDef_HEAD_INIT, "fastjsonl", "uniir_tpu native host data-path", -1, Methods};

}  // namespace

PyMODINIT_FUNC PyInit_fastjsonl(void) { return PyModule_Create(&Module); }
