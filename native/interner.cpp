// Native host data plane: string interner + CSR posting-list builder.
//
// The ingest hot loop turns terms into ids and accumulates (term_id,
// semref_id, score) postings; at query compile time the postings are laid
// out as CSR arrays (offsets / semref ids / scores) that upload straight to
// the device for the fused query program (typeagent_tpu/ops/postings.py).
// Python binds via ctypes (no pybind11 dependency).
//
// Exposed C ABI:
//   tat_interner_new / tat_interner_free
//   tat_intern(handle, bytes, len) -> id          (lowercases ASCII inline)
//   tat_lookup(handle, bytes, len) -> id or -1    (no insert)
//   tat_interner_size(handle)
//   tat_postings_add(handle, term_id, semref_id, score)
//   tat_postings_size(handle)
//   tat_postings_build_csr(handle, offsets*, semrefs*, scores*)
//     offsets has interner_size+1 entries; postings sorted by (term, insert order)

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Posting {
    int32_t term_id;
    int32_t semref_id;
    float score;
};

struct Interner {
    std::unordered_map<std::string, int32_t> ids;
    std::vector<Posting> postings;

    int32_t intern(std::string key) {
        auto [it, inserted] = ids.emplace(std::move(key), (int32_t)ids.size());
        return it->second;
    }
};

std::string normalize(const char* data, int64_t len) {
    std::string s(data, (size_t)len);
    // ASCII lowercase; multi-byte UTF-8 passes through untouched (Python
    // pre-lowercases non-ASCII, this is the fast path for the common case).
    for (char& c : s) {
        if (c >= 'A' && c <= 'Z') c = (char)(c - 'A' + 'a');
    }
    return s;
}

}  // namespace

extern "C" {

void* tat_interner_new() { return new Interner(); }

void tat_interner_free(void* handle) { delete (Interner*)handle; }

int32_t tat_intern(void* handle, const char* data, int64_t len) {
    return ((Interner*)handle)->intern(normalize(data, len));
}

int32_t tat_lookup(void* handle, const char* data, int64_t len) {
    auto& ids = ((Interner*)handle)->ids;
    auto it = ids.find(normalize(data, len));
    return it == ids.end() ? -1 : it->second;
}

int64_t tat_interner_size(void* handle) {
    return (int64_t)((Interner*)handle)->ids.size();
}

void tat_postings_add(void* handle, int32_t term_id, int32_t semref_id,
                      float score) {
    ((Interner*)handle)->postings.push_back({term_id, semref_id, score});
}

int64_t tat_postings_size(void* handle) {
    return (int64_t)((Interner*)handle)->postings.size();
}

// Batch interning: `data` is the concatenation of UTF-8 terms, `starts`
// holds n+1 byte offsets; writes n term ids to `out_ids`. One ctypes call
// for the whole batch (per-call FFI overhead dominates otherwise).
void tat_intern_batch(void* handle, const char* data, const int64_t* starts,
                      int64_t n, int32_t* out_ids) {
    Interner* interner = (Interner*)handle;
    for (int64_t i = 0; i < n; i++) {
        out_ids[i] = interner->intern(
            normalize(data + starts[i], starts[i + 1] - starts[i]));
    }
}

void tat_postings_add_batch(void* handle, const int32_t* term_ids,
                            const int32_t* semref_ids, const float* scores,
                            int64_t n) {
    Interner* interner = (Interner*)handle;
    interner->postings.reserve(interner->postings.size() + (size_t)n);
    for (int64_t i = 0; i < n; i++) {
        interner->postings.push_back({term_ids[i], semref_ids[i], scores[i]});
    }
}

// Counting sort by term id: O(postings + terms), stable (preserves insert
// order within a term, matching the Python dict-of-lists semantics).
void tat_postings_build_csr(void* handle, int64_t* offsets, int32_t* semrefs,
                            float* scores) {
    Interner* interner = (Interner*)handle;
    int64_t n_terms = (int64_t)interner->ids.size();
    std::vector<int64_t> counts((size_t)n_terms + 1, 0);
    for (const Posting& p : interner->postings) {
        counts[(size_t)p.term_id + 1]++;
    }
    for (int64_t t = 0; t < n_terms; t++) {
        counts[(size_t)t + 1] += counts[(size_t)t];
    }
    std::memcpy(offsets, counts.data(), sizeof(int64_t) * (size_t)(n_terms + 1));
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (const Posting& p : interner->postings) {
        int64_t pos = cursor[(size_t)p.term_id]++;
        semrefs[pos] = p.semref_id;
        scores[pos] = p.score;
    }
}

}  // extern "C"
