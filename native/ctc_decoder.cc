// CTC prefix beam search decoder with optional ARPA n-gram LM fusion.
//
// TPU-native replacement for the reference's external `ctcdecode_edited`
// C++ package (used at otrans/recognize/ctc.py:19-25 with KenLM alpha/beta
// weights): the TPU produces frame log-probs; this host-side decoder runs
// the label-synchronous prefix search that doesn't map to the MXU.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image):
//   lm_load(path, vocab, vocab_size)          -> LM handle; the format is
//                                                detected by magic: ARPA text,
//                                                the first-party "OTLM" binary
//                                                cache (see SaveBinary), or a
//                                                KenLM PROBING binary (the
//                                                format ctcdecode feeds to
//                                                kenlm; see KenlmProbingLM)
//   lm_save_binary(handle, path)              -> write the binary cache
//   lm_free(handle)
//   ctc_beam_decode(...)                      -> n-best token sequences
//
// Scoring follows the ctcdecode convention: at each non-blank extension the
// candidate gains alpha * log P_lm(token | context) + beta; the final rank
// is by combined acoustic+LM score.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libctc_decoder.so ctc_decoder.cc -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;

inline float LogSumExp(float a, float b) {
  if (a <= kNegInf) return b;
  if (b <= kNegInf) return a;
  float m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Common interface: decoder-side token-id scoring with ARPA back-off.
struct LmBase {
  virtual ~LmBase() = default;
  virtual int Order() const = 0;
  // natural-log P(token | context) with standard back-off accumulation
  virtual float Score(const std::vector<int32_t>& context, int32_t token) const = 0;
};

// ---------------------------------------------------------------------------
// ARPA n-gram LM over token ids.
// ---------------------------------------------------------------------------
struct NgramLM : LmBase {
  int order = 0;
  // key: token-id sequence packed as string of int32; value: (logp, backoff)
  std::unordered_map<std::string, std::pair<float, float>> table;
  std::unordered_map<std::string, int> vocab;  // unit string -> token id
  float oov_logp = -10.0f;
  uint64_t vocab_hash = 0;  // ids in `table` depend on the vocab ordering

  static std::string Key(const int32_t* ids, int n) {
    return std::string(reinterpret_cast<const char*>(ids), n * sizeof(int32_t));
  }

  int Order() const override { return order; }

  // log10 probabilities in ARPA are converted to natural log here.
  float Score(const std::vector<int32_t>& context, int32_t token) const override {
    // try longest n-gram first: (context suffix + token)
    std::vector<int32_t> ids;
    int max_ctx = std::min<int>(order - 1, context.size());
    for (int use = max_ctx; use >= 0; --use) {
      ids.assign(context.end() - use, context.end());
      ids.push_back(token);
      auto it = table.find(Key(ids.data(), ids.size()));
      if (it != table.end()) {
        // found: add backoffs of the skipped longer contexts? Standard
        // back-off: P(w|c) = P_found + sum of backoff weights of contexts
        // that failed to match (handled below by accumulating as we shorten).
        float backoff_sum = 0.0f;
        for (int longer = use + 1; longer <= max_ctx; ++longer) {
          std::vector<int32_t> ctx(context.end() - longer, context.end());
          auto bo = table.find(Key(ctx.data(), ctx.size()));
          if (bo != table.end()) backoff_sum += bo->second.second;
        }
        return it->second.first + backoff_sum;
      }
    }
    return oov_logp;
  }
};

// FNV-1a over the vocab units (ids in the LM table are positional).
uint64_t HashVocab(const char* const* vocab_units, int vocab_size) {
  uint64_t h = 1469598103934665603ull;
  auto mix = [&](const char* s, size_t n) {
    for (size_t i = 0; i < n; ++i) {
      h ^= (unsigned char)s[i];
      h *= 1099511628211ull;
    }
  };
  for (int i = 0; i < vocab_size; ++i) {
    mix(vocab_units[i], std::strlen(vocab_units[i]) + 1);  // incl. NUL sep
  }
  return h ^ (uint64_t)vocab_size;
}

// ---------------------------------------------------------------------------
// Binary LM cache ("OTLM"): a serialized parse of the ARPA table. Loading it
// skips text tokenization and vocab lookups — the startup cost for large
// n-gram models (the reason KenLM has a binary format; ours is first-party).
// Layout: magic u32 | version u32 | order i32 | oov f32 | vocab_hash u64 |
//         n u64 | n x { key_bytes u32, key..., logp f32, backoff f32 }.
// ---------------------------------------------------------------------------
constexpr uint32_t kOtlmMagic = 0x4d4c544f;  // "OTLM" little-endian
constexpr uint32_t kOtlmVersion = 1;

bool SaveBinary(const NgramLM& lm, const char* path) {
  // write-to-temp + rename so two concurrent decode processes caching the
  // same ARPA can never interleave writes into a corrupt-but-plausible file
  std::string tmp = std::string(path) + ".tmp." + std::to_string(::getpid());
  {
    std::ofstream out(tmp, std::ios::binary | std::ios::trunc);
    if (!out.good()) return false;
    auto put = [&](const void* p, size_t n) { out.write((const char*)p, n); };
    uint64_t n = lm.table.size();
    put(&kOtlmMagic, 4);
    put(&kOtlmVersion, 4);
    put(&lm.order, 4);
    put(&lm.oov_logp, 4);
    put(&lm.vocab_hash, 8);
    put(&n, 8);
    for (const auto& kv : lm.table) {
      uint32_t kb = kv.first.size();
      put(&kb, 4);
      put(kv.first.data(), kb);
      put(&kv.second.first, 4);
      put(&kv.second.second, 4);
    }
    if (!out.good()) {
      out.close();
      std::remove(tmp.c_str());
      return false;
    }
  }
  if (std::rename(tmp.c_str(), path) != 0) {
    std::remove(tmp.c_str());
    return false;
  }
  return true;
}

NgramLM* LoadBinary(std::ifstream& in, uint64_t expected_hash) {
  auto lm = std::make_unique<NgramLM>();
  uint32_t version = 0;
  uint64_t n = 0, hash = 0;
  auto get = [&](void* p, size_t sz) { in.read((char*)p, sz); };
  get(&version, 4);
  get(&lm->order, 4);
  get(&lm->oov_logp, 4);
  get(&hash, 8);
  get(&n, 8);
  if (!in.good() || version != kOtlmVersion || hash != expected_hash) {
    return nullptr;  // stale cache (different vocab) or format mismatch
  }
  lm->vocab_hash = hash;
  lm->table.reserve(n);
  std::string key;
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t kb = 0;
    get(&kb, 4);
    if (!in.good() || kb > 4096) return nullptr;
    key.resize(kb);
    get(&key[0], kb);
    float logp = 0.0f, backoff = 0.0f;
    get(&logp, 4);
    get(&backoff, 4);
    if (!in.good()) return nullptr;
    lm->table.emplace(key, std::make_pair(logp, backoff));
  }
  return lm.release();
}

// ---------------------------------------------------------------------------
// KenLM PROBING binary reader.
//
// The reference decodes CTC with KenLM binaries through ctcdecode
// (otrans/recognize/ctc.py:19-25); users arrive with `build_binary probing`
// files, so `-ngram lm.klm` accepts them directly. Layout per the KenLM
// sources (lm/binary_format.cc, lm/vocab.cc, lm/search_hashed.hh,
// util/probing_hash_table.hh), version-5 magic:
//
//   Sanity        : magic[52] "mmap lm http://kheafield.com/code format
//                   version 5\n\0", zero_f, one_f, minus_half_f (f32),
//                   one_word_index=1, max_word_index=2^32-1 (u32),
//                   one_uint64=1 (u64); 80 bytes.
//   FixedWidth    : order u8 (+3 pad), probing_multiplier f32,
//                   model_type i32 (0 = PROBING), has_vocabulary u8 (+3
//                   pad), search_version u32; 20 bytes.
//   counts        : u64[order]; header then padded to 8.
//   vocab         : ProbingVocabularyHeader {version u32, bound u32}, then a
//                   probing hash table of packed {u64 murmur(word), u32 id}
//                   entries (12 B), buckets = max(n+1, multiplier*n).
//   search        : unigram ProbBackoff[counts[0] + 1] (f32 prob, f32
//                   backoff, log10); per middle order 2..n-1 a probing table
//                   of packed {u64 key, f32 prob, f32 backoff} (16 B); the
//                   longest order a probing table of packed {u64 key, f32
//                   prob} (12 B). Key = chained hash starting from the
//                   predicted word: h = word_n; h = h*8978948897894561157 ^
//                   (1+word_i)*17894857484156487943 for i = n-1..1.
//   vocab strings : iff has_vocabulary — NUL-terminated words in id order
//                   ("<unk>" first); used here to map this vocab's units to
//                   KenLM word ids (the hash table stores hashes only).
//
// Scoring walks the same back-off recursion as the ARPA path, so a .klm and
// its source .arpa decode identically (tests/test_native_ctc.py fixture).
// ---------------------------------------------------------------------------
const char kKenlmMagic[] = "mmap lm http://kheafield.com/code format version 5\n";

struct KenlmProbingLM : LmBase {
  int order = 0;
  std::vector<uint64_t> counts;
  std::vector<std::pair<float, float>> unigram;  // [word] -> (log10 p, log10 bo)
  struct Table {
    std::vector<char> bytes;
    uint64_t buckets = 0;
    size_t entry_size = 0;
  };
  std::vector<Table> middles;  // orders 2..n-1
  Table longest;               // order n (prob only)
  std::vector<uint32_t> our_to_ken;  // our token id -> kenlm word id (0 = <unk>)
  uint32_t bos_id = 0, eos_id = 0;

  int Order() const override { return order; }

  static uint64_t Buckets(uint64_t entries, float multiplier) {
    // util/probing_hash_table.hh Size(): max(entries + 1, multiplier * entries)
    uint64_t scaled = (uint64_t)(multiplier * (float)entries);
    return std::max(entries + 1, scaled);
  }

  static uint64_t ChainHash(const uint32_t* words, int n) {
    // lm/model.cc lookup order: start from the predicted (last) word and
    // fold in history from most recent to oldest
    uint64_t h = (uint64_t)words[n - 1];
    for (int i = n - 2; i >= 0; --i) {
      h = (h * 8978948897894561157ull) ^ ((uint64_t)(1u + words[i]) * 17894857484156487943ull);
    }
    return h;
  }

  // probe `table` for `key`; entry layout = u64 key then payload
  static const char* Find(const Table& t, uint64_t key) {
    if (t.buckets == 0) return nullptr;
    uint64_t i = key % t.buckets;
    for (uint64_t probes = 0; probes < t.buckets; ++probes) {
      const char* e = t.bytes.data() + i * t.entry_size;
      uint64_t k;
      std::memcpy(&k, e, 8);
      if (k == key) return e;
      if (k == 0) return nullptr;  // empty slot: miss
      if (++i == t.buckets) i = 0;
    }
    return nullptr;
  }

  // (log10 prob, log10 backoff) of the kenlm-id n-gram, if present
  bool Lookup(const uint32_t* words, int n, float* logp, float* backoff) const {
    if (n == 1) {
      if (words[0] >= unigram.size()) return false;
      *logp = unigram[words[0]].first;
      *backoff = unigram[words[0]].second;
      return true;
    }
    uint64_t key = ChainHash(words, n);
    if (n == order) {
      const char* e = Find(longest, key);
      if (!e) return false;
      std::memcpy(logp, e + 8, 4);
      *backoff = 0.0f;
      return true;
    }
    const Table& t = middles[n - 2];
    const char* e = Find(t, key);
    if (!e) return false;
    std::memcpy(logp, e + 8, 4);
    std::memcpy(backoff, e + 12, 4);
    return true;
  }

  uint32_t MapToken(int32_t tok) const {
    if (tok == -1) return bos_id;
    if (tok == -2) return eos_id;
    if (tok < 0 || (size_t)tok >= our_to_ken.size()) return 0;
    return our_to_ken[tok];
  }

  float Score(const std::vector<int32_t>& context, int32_t token) const override {
    const float ln10 = std::log(10.0f);
    int max_ctx = std::min<int>(order - 1, context.size());
    std::vector<uint32_t> ids(max_ctx + 1);
    for (int i = 0; i < max_ctx; ++i) ids[i] = MapToken(context[context.size() - max_ctx + i]);
    ids[max_ctx] = MapToken(token);
    for (int use = max_ctx; use >= 0; --use) {
      float logp, backoff;
      if (Lookup(ids.data() + (max_ctx - use), use + 1, &logp, &backoff)) {
        float backoff_sum = 0.0f;
        for (int longer = use + 1; longer <= max_ctx; ++longer) {
          float bp, bb;
          if (Lookup(ids.data() + (max_ctx - longer), longer, &bp, &bb)) backoff_sum += bb;
        }
        return (logp + backoff_sum) * ln10;
      }
    }
    return -10.0f;  // unigram miss: out-of-range word id
  }
};

KenlmProbingLM* LoadKenlmProbing(const char* path, const char* const* vocab_units,
                                 int vocab_size) {
  std::ifstream in(path, std::ios::binary);
  if (!in.good()) return nullptr;
  auto get = [&](void* p, size_t n) { in.read((char*)p, n); return in.good(); };

  // Sanity (80 bytes)
  char magic[52];
  if (!get(magic, 52) || std::memcmp(magic, kKenlmMagic, 51) != 0) return nullptr;
  float zero_f, one_f, minus_half_f;
  uint32_t one_word, max_word;
  uint64_t one_u64;
  if (!get(&zero_f, 4) || !get(&one_f, 4) || !get(&minus_half_f, 4) ||
      !get(&one_word, 4) || !get(&max_word, 4) || !get(&one_u64, 8))
    return nullptr;
  if (zero_f != 0.0f || one_f != 1.0f || minus_half_f != -0.5f ||
      one_word != 1 || one_u64 != 1)
    return nullptr;  // endianness / layout mismatch

  // FixedWidthParameters (20 bytes)
  uint8_t order_u8, pad3[3], has_vocab, pad3b[3];
  float multiplier;
  int32_t model_type;
  uint32_t search_version;
  if (!get(&order_u8, 1) || !get(pad3, 3) || !get(&multiplier, 4) ||
      !get(&model_type, 4) || !get(&has_vocab, 1) || !get(pad3b, 3) ||
      !get(&search_version, 4))
    return nullptr;
  if (model_type != 0) return nullptr;    // only PROBING supported
  if (search_version != 0) return nullptr;  // SearchHashed::VERSION — a
  // different hashed-search revision means different table packing; reject
  // rather than misparse offsets into silently-wrong LM scores
  if (!has_vocab) return nullptr;         // need trailing words to map units
  if (order_u8 < 1 || multiplier < 1.0f) return nullptr;

  auto lm = std::make_unique<KenlmProbingLM>();
  lm->order = order_u8;
  lm->counts.resize(lm->order);
  if (!get(lm->counts.data(), 8 * lm->order)) return nullptr;
  // header region is padded to a multiple of 8
  uint64_t header = 80 + 20 + 8ull * lm->order;
  uint64_t aligned = (header + 7) & ~7ull;
  if (aligned > header) in.ignore(aligned - header);

  // vocabulary: header + hash table of packed {u64, u32} entries
  uint32_t vocab_version, bound;
  if (!get(&vocab_version, 4) || !get(&bound, 4)) return nullptr;
  uint64_t vocab_buckets = KenlmProbingLM::Buckets(lm->counts[0], multiplier);
  in.ignore(vocab_buckets * 12);  // hashes are unused: words come from the tail

  // unigrams
  lm->unigram.resize(lm->counts[0] + 1);
  if (!get(lm->unigram.data(), lm->unigram.size() * 8)) return nullptr;

  // middle + longest probing tables
  auto read_table = [&](KenlmProbingLM::Table& t, uint64_t entries, size_t esz) {
    t.buckets = KenlmProbingLM::Buckets(entries, multiplier);
    t.entry_size = esz;
    t.bytes.resize(t.buckets * esz);
    return get(t.bytes.data(), t.bytes.size());
  };
  lm->middles.resize(std::max(lm->order - 2, 0));
  for (int o = 2; o < lm->order; ++o) {
    if (!read_table(lm->middles[o - 2], lm->counts[o - 1], 16)) return nullptr;
  }
  if (lm->order >= 2) {
    if (!read_table(lm->longest, lm->counts[lm->order - 1], 12)) return nullptr;
  }

  // trailing vocabulary strings, one per word id, "<unk>" first
  std::unordered_map<std::string, uint32_t> word_to_id;
  {
    std::string rest((std::istreambuf_iterator<char>(in)),
                     std::istreambuf_iterator<char>());
    size_t pos = 0;
    uint32_t id = 0;
    while (pos < rest.size() && id < bound) {
      size_t nul = rest.find('\0', pos);
      if (nul == std::string::npos) break;
      word_to_id.emplace(rest.substr(pos, nul - pos), id++);
      pos = nul + 1;
    }
    if (id != bound) return nullptr;  // truncated file
  }
  auto find_id = [&](const char* w) -> uint32_t {
    auto it = word_to_id.find(w);
    return it == word_to_id.end() ? 0 : it->second;
  };
  lm->bos_id = find_id("<s>");
  lm->eos_id = find_id("</s>");
  lm->our_to_ken.resize(vocab_size, 0);
  for (int i = 0; i < vocab_size; ++i) lm->our_to_ken[i] = find_id(vocab_units[i]);
  return lm.release();
}

NgramLM* LoadArpa(const char* path, const char* const* vocab_units, int vocab_size) {
  std::ifstream in(path, std::ios::binary);
  if (!in.good()) return nullptr;
  uint64_t vhash = HashVocab(vocab_units, vocab_size);
  uint32_t magic = 0;
  in.read((char*)&magic, 4);
  if (in.gcount() == 4 && magic == kOtlmMagic) return LoadBinary(in, vhash);
  in.close();
  in.open(path);
  if (!in.good()) return nullptr;
  auto lm = std::make_unique<NgramLM>();
  lm->vocab_hash = vhash;
  for (int i = 0; i < vocab_size; ++i) lm->vocab[vocab_units[i]] = i;

  const float ln10 = std::log(10.0f);
  std::string line;
  int cur_order = 0;
  bool in_data = false;
  while (std::getline(in, line)) {
    if (line.rfind("\\data\\", 0) == 0) { in_data = true; continue; }
    if (line.rfind("\\end\\", 0) == 0) break;
    if (line.size() > 1 && line[0] == '\\') {
      // "\N-grams:" section header
      cur_order = std::atoi(line.c_str() + 1);
      lm->order = std::max(lm->order, cur_order);
      continue;
    }
    if (!in_data || cur_order == 0 || line.empty()) continue;
    std::istringstream ss(line);
    float logp;
    if (!(ss >> logp)) continue;
    std::vector<int32_t> ids;
    ids.reserve(cur_order);
    bool ok = true;
    for (int i = 0; i < cur_order; ++i) {
      std::string tok;
      if (!(ss >> tok)) { ok = false; break; }
      // sentence-boundary markers get reserved ids outside the vocab so
      // their entries can't collide with real units (CTC hypotheses never
      // contain them; their probabilities only matter via backoff weights)
      if (tok == "<s>") { ids.push_back(-1); continue; }
      if (tok == "</s>") { ids.push_back(-2); continue; }
      auto it = lm->vocab.find(tok);
      if (it == lm->vocab.end()) { ok = false; break; }
      ids.push_back(it->second);
    }
    if (!ok) continue;
    float backoff = 0.0f;
    ss >> backoff;  // optional
    lm->table[NgramLM::Key(ids.data(), ids.size())] = {logp * ln10, backoff * ln10};
  }
  // an "LM" with zero n-grams is a parse failure (e.g. a truncated binary
  // cache whose magic was clobbered falling through to the text parser) —
  // fail loudly rather than silently scoring everything as OOV
  if (lm->table.empty()) return nullptr;
  return lm.release();
}

// ---------------------------------------------------------------------------
// Prefix beam search (Hannun et al.) with two-probability bookkeeping.
// ---------------------------------------------------------------------------
struct Beam {
  std::vector<int32_t> prefix;
  float p_b = kNegInf;   // ends in blank
  float p_nb = kNegInf;  // ends in non-blank
  float lm_score = 0.0f; // accumulated alpha*lm + beta terms
  float Total() const { return LogSumExp(p_b, p_nb) + lm_score; }
};

// Prefix beam search over per-frame CANDIDATE LISTS (label id + log-prob):
// the core shared by the dense [T, V] path (host-pruned, below) and the
// sparse path (device-pruned via the fused top-k kernel — only [T, n_cand]
// crosses device→host). blank_lp[t] supplies the blank's exact log-prob for
// frames whose candidate list does not already contain blank (CTC needs the
// blank transition for every beam at every frame).
void DecodeOneCands(const float* cand_lp, const int32_t* cand_ids,
                    const float* blank_lp, int frames, int n_cand, int blank,
                    int beam_width, float alpha, float beta,
                    const LmBase* lm, int max_out,
                    int32_t* out_tokens, int32_t* out_len, float* out_score,
                    int nbest) {
  std::vector<Beam> beams(1);
  beams[0].p_b = 0.0f;

  std::vector<Beam> next;
  std::unordered_map<std::string, int> index;
  std::vector<std::pair<int, float>> syms;  // hoisted: reused across frames

  for (int t = 0; t < frames; ++t) {
    const float* lp = cand_lp + (size_t)t * n_cand;
    const int32_t* ids = cand_ids + (size_t)t * n_cand;
    syms.clear();
    bool has_blank = false;
    for (int i = 0; i < n_cand; ++i) {
      syms.emplace_back(ids[i], lp[i]);
      has_blank |= (ids[i] == blank);
    }
    if (!has_blank) syms.emplace_back(blank, blank_lp[t]);

    next.clear();
    index.clear();
    auto emit = [&](const std::vector<int32_t>& prefix, float pb, float pnb,
                    float lm_score) {
      std::string key = NgramLM::Key(prefix.data(), prefix.size());
      auto it = index.find(key);
      if (it == index.end()) {
        index[key] = next.size();
        Beam nb;
        nb.prefix = prefix;
        nb.p_b = pb;
        nb.p_nb = pnb;
        nb.lm_score = lm_score;
        next.push_back(std::move(nb));
      } else {
        Beam& nb = next[it->second];
        nb.p_b = LogSumExp(nb.p_b, pb);
        nb.p_nb = LogSumExp(nb.p_nb, pnb);
      }
    };

    for (const Beam& b : beams) {
      float total = LogSumExp(b.p_b, b.p_nb);
      for (const auto& sp : syms) {
        int s = sp.first;
        float p = sp.second;
        if (s == blank) {
          emit(b.prefix, total + p, kNegInf, b.lm_score);
        } else if (!b.prefix.empty() && s == b.prefix.back()) {
          // repeat symbol: stays same prefix from non-blank path
          emit(b.prefix, kNegInf, b.p_nb + p, b.lm_score);
          // …or extends via a blank separator
          std::vector<int32_t> ext = b.prefix;
          ext.push_back(s);
          float lm_add = 0.0f;
          if (lm) lm_add = alpha * lm->Score(b.prefix, s) + beta;
          emit(ext, kNegInf, b.p_b + p, b.lm_score + lm_add);
        } else {
          std::vector<int32_t> ext = b.prefix;
          ext.push_back(s);
          float lm_add = 0.0f;
          if (lm) lm_add = alpha * lm->Score(b.prefix, s) + beta;
          emit(ext, kNegInf, total + p, b.lm_score + lm_add);
        }
      }
    }
    int keep = std::min<int>(beam_width, next.size());
    std::partial_sort(next.begin(), next.begin() + keep, next.end(),
                      [](const Beam& a, const Beam& b) { return a.Total() > b.Total(); });
    next.resize(keep);
    beams.swap(next);
  }

  std::sort(beams.begin(), beams.end(),
            [](const Beam& a, const Beam& b) { return a.Total() > b.Total(); });
  int n = std::min<int>(nbest, beams.size());
  for (int i = 0; i < n; ++i) {
    const Beam& b = beams[i];
    int len = std::min<int>(b.prefix.size(), max_out);
    std::memcpy(out_tokens + (size_t)i * max_out, b.prefix.data(), len * sizeof(int32_t));
    out_len[i] = len;
    out_score[i] = b.Total();
  }
  for (int i = n; i < nbest; ++i) { out_len[i] = 0; out_score[i] = kNegInf; }
}

// Dense [T, V] wrapper: prune to the top prune_k labels per frame on the
// host, then run the candidate-list core (historical behavior unchanged —
// same labels, same order, blank force-appended when outside the top-k).
void DecodeOne(const float* log_probs, int frames, int vocab, int blank,
               int beam_width, int prune_k, float alpha, float beta,
               const LmBase* lm, int max_out,
               int32_t* out_tokens, int32_t* out_len, float* out_score,
               int nbest) {
  int k = std::min(prune_k, vocab);
  std::vector<float> cand_lp((size_t)frames * k);
  std::vector<int32_t> cand_ids((size_t)frames * k);
  std::vector<float> blank_lp(frames);
  std::vector<int> order(vocab);
  for (int t = 0; t < frames; ++t) {
    const float* frame = log_probs + (size_t)t * vocab;
    for (int i = 0; i < vocab; ++i) order[i] = i;
    std::partial_sort(order.begin(), order.begin() + k, order.end(),
                      [&](int a, int b) { return frame[a] > frame[b]; });
    for (int i = 0; i < k; ++i) {
      cand_ids[(size_t)t * k + i] = order[i];
      cand_lp[(size_t)t * k + i] = frame[order[i]];
    }
    blank_lp[t] = frame[blank];
  }
  DecodeOneCands(cand_lp.data(), cand_ids.data(), blank_lp.data(), frames, k,
                 blank, beam_width, alpha, beta, lm, max_out,
                 out_tokens, out_len, out_score, nbest);
}

}  // namespace

extern "C" {

void* lm_load(const char* path, const char* const* vocab_units, int vocab_size) {
  {
    std::ifstream in(path, std::ios::binary);
    char head[52] = {0};
    in.read(head, 52);
    if (in.gcount() >= 51 && std::memcmp(head, kKenlmMagic, 51) == 0) {
      return static_cast<LmBase*>(LoadKenlmProbing(path, vocab_units, vocab_size));
    }
  }
  return static_cast<LmBase*>(LoadArpa(path, vocab_units, vocab_size));
}

void lm_free(void* handle) { delete static_cast<LmBase*>(handle); }

int lm_order(void* handle) {
  return handle ? static_cast<LmBase*>(handle)->Order() : 0;
}

// Serialize a loaded ARPA-backed LM to the OTLM cache; returns 0 on success.
// KenLM-backed handles are already binary: report failure so callers skip.
int lm_save_binary(void* handle, const char* path) {
  if (!handle) return 1;
  auto* arpa = dynamic_cast<NgramLM*>(static_cast<LmBase*>(handle));
  if (!arpa) return 1;
  return SaveBinary(*arpa, path) ? 0 : 1;
}

// log_probs: [batch, frames, vocab] f32; frame_counts: [batch] i32.
// out_tokens: [batch, nbest, max_out] i32; out_lens: [batch, nbest] i32;
// out_scores: [batch, nbest] f32. Decodes utterances in parallel threads.
void ctc_beam_decode(const float* log_probs, const int32_t* frame_counts,
                     int batch, int frames, int vocab, int blank,
                     int beam_width, int prune_k, float alpha, float beta,
                     void* lm_handle, int max_out, int nbest, int num_threads,
                     int32_t* out_tokens, int32_t* out_lens, float* out_scores) {
  const LmBase* lm = static_cast<const LmBase*>(lm_handle);
  if (num_threads < 1) num_threads = std::thread::hardware_concurrency();
  std::vector<std::thread> pool;
  std::atomic<int> counter{0};  // local: concurrent decode calls stay independent
  auto work = [&]() {
    for (;;) {
      int i = counter.fetch_add(1);
      if (i >= batch) return;
      DecodeOne(log_probs + (size_t)i * frames * vocab, frame_counts[i], vocab,
                blank, beam_width, prune_k, alpha, beta, lm, max_out,
                out_tokens + (size_t)i * nbest * max_out,
                out_lens + (size_t)i * nbest,
                out_scores + (size_t)i * nbest, nbest);
    }
  };
  int n = std::min(num_threads, batch);
  for (int i = 0; i < n; ++i) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

// Sparse variant: candidates pre-pruned on the device (fused top-k kernel).
// cand_lp: [batch, frames, n_cand] f32; cand_ids: [batch, frames, n_cand]
// i32; blank_lp: [batch, frames] f32 (exact blank log-prob per frame —
// consulted when blank is not among the candidates). Same outputs as
// ctc_beam_decode; with n_cand == that call's prune_k the results match.
void ctc_beam_decode_sparse(const float* cand_lp, const int32_t* cand_ids,
                            const float* blank_lp,
                            const int32_t* frame_counts,
                            int batch, int frames, int n_cand, int blank,
                            int beam_width, float alpha, float beta,
                            void* lm_handle, int max_out, int nbest,
                            int num_threads,
                            int32_t* out_tokens, int32_t* out_lens,
                            float* out_scores) {
  const LmBase* lm = static_cast<const LmBase*>(lm_handle);
  if (num_threads < 1) num_threads = std::thread::hardware_concurrency();
  std::vector<std::thread> pool;
  std::atomic<int> counter{0};
  auto work = [&]() {
    for (;;) {
      int i = counter.fetch_add(1);
      if (i >= batch) return;
      DecodeOneCands(cand_lp + (size_t)i * frames * n_cand,
                     cand_ids + (size_t)i * frames * n_cand,
                     blank_lp + (size_t)i * frames,
                     frame_counts[i], n_cand, blank, beam_width, alpha, beta,
                     lm, max_out,
                     out_tokens + (size_t)i * nbest * max_out,
                     out_lens + (size_t)i * nbest,
                     out_scores + (size_t)i * nbest, nbest);
    }
  };
  int n = std::min(num_threads, batch);
  for (int i = 0; i < n; ++i) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
