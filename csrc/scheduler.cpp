// Continuous-batching scheduler + paged-KV block manager (native runtime).
//
// The reference's GPU-side scheduler (hopper/flash_prepare_scheduler.cu:43
// prepare_varlen_num_blocks_kernel: per-batch split planning + LPT batch
// ordering) plans work *inside* a CUDA kernel because its consumers are GPU
// kernels in the same stream. On TPU the analogous planning runs on the
// host between jitted steps, so it lives here as a C++ component driving
// the serving engine (flash_attn_tpu/runtime/engine.py): page allocation
// (vLLM-style block manager), request admission, LPT-ordered chunked
// prefill, and decode-batch assembly into caller-provided buffers.
//
// Exposed through a C ABI consumed via ctypes (no pybind11 dependency).
// A pure-Python twin (runtime/scheduler.py PyScheduler) implements the
// identical policy; a differential test keeps them in lockstep.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

enum State { WAITING = 0, PREFILLING = 1, RUNNING = 2, DONE = 3 };

struct Request {
  int id;
  int prompt_len;
  int max_new_tokens;
  int prefilled = 0;   // prompt tokens already prefilled
  int generated = 0;   // new tokens generated
  State state = WAITING;
  std::vector<int> pages;
};

struct Scheduler {
  int num_pages;
  int page_size;
  int max_batch;
  int max_pages_per_seq;
  int chunk_size;
  int decode_depth = 1;  // decode tokens planned per step (multi-step decode)
  int window_tokens = 0;  // sliding-window visible keys; 0 = no eviction
  std::vector<int> free_pages;  // LIFO free list
  std::vector<int> ref;         // per-page refcount (0 = free)
  std::unordered_map<int, Request> requests;
  std::deque<int> waiting;      // FIFO admission queue
  std::vector<int> active;      // prefilling or running, admission order

  int total_len(const Request& r) const { return r.prompt_len + r.generated; }

  int pages_needed(int tokens) const {
    return (tokens + page_size - 1) / page_size;
  }

  bool ensure_pages(Request& r, int upto_tokens) {
    int need = pages_needed(upto_tokens);
    if (need > max_pages_per_seq) return false;
    while ((int)r.pages.size() < need) {
      if (free_pages.empty()) return false;
      int p = free_pages.back();
      free_pages.pop_back();
      ref[p] = 1;
      r.pages.push_back(p);
    }
    return true;
  }

  void decref(int p) {
    if (--ref[p] == 0) free_pages.push_back(p);
  }

  // Sliding-window KV eviction: with window attention, no query from
  // next_pos onward ever reads keys below next_pos - (window_tokens - 1),
  // so pages wholly beneath that are dead — release them to the pool,
  // leaving -1 placeholders to keep the block table positional (the
  // engine redirects -1 to its trash page; window masking means the
  // kernel never reads them).
  void evict_window(Request& r, int next_pos) {
    if (window_tokens <= 0) return;
    int64_t keep_from = (int64_t)next_pos - (window_tokens - 1);
    for (size_t j = 0; j < r.pages.size(); ++j) {
      if (r.pages[j] < 0) continue;
      if ((int64_t)(j + 1) * page_size <= keep_from) {
        decref(r.pages[j]);
        r.pages[j] = -1;
      }
    }
  }

  void release(Request& r) {
    // Shared (prefix-cache) pages may outlive this request: only pages
    // whose refcount reaches zero return to the free list, in r.pages
    // order (identical to the Python twin).
    for (int p : r.pages)
      if (p >= 0) decref(p);
    r.pages.clear();
  }
};

}  // namespace

extern "C" {

void* sched_create(int num_pages, int page_size, int max_batch,
                   int max_pages_per_seq, int chunk_size) {
  auto* s = new Scheduler();
  s->num_pages = num_pages;
  s->page_size = page_size;
  s->max_batch = max_batch;
  s->max_pages_per_seq = max_pages_per_seq;
  s->chunk_size = chunk_size;
  s->free_pages.resize(num_pages);
  // Descending so pages allocate in ascending order (easier to debug and
  // identical to the Python twin).
  for (int i = 0; i < num_pages; ++i) s->free_pages[i] = num_pages - 1 - i;
  s->ref.assign(num_pages, 0);
  return s;
}

void sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// Admission with prefix-cache page sharing: the first num_shared pages of
// the request are existing pages (already holding its first
// num_shared*page_size prompt tokens, e.g. from the engine's prefix
// registry). Their refcounts are incremented and the request's prefill
// cursor starts after them, so those tokens are never re-prefilled.
int sched_add_request_shared(void* h, int request_id, int prompt_len,
                             int max_new_tokens, int num_shared,
                             const int* shared_pages) {
  auto* s = static_cast<Scheduler*>(h);
  if (s->requests.count(request_id)) return -1;
  if (s->pages_needed(prompt_len + max_new_tokens) > s->max_pages_per_seq)
    return -2;  // can never fit
  if (num_shared * s->page_size > prompt_len || num_shared > s->max_pages_per_seq)
    return -3;  // shared pages must cover only full prompt pages
  for (int i = 0; i < num_shared; ++i) {
    int p = shared_pages[i];
    if (p < 0 || p >= s->num_pages || s->ref[p] == 0) return -4;  // not live
  }
  Request r;
  r.id = request_id;
  r.prompt_len = prompt_len;
  r.max_new_tokens = max_new_tokens;
  for (int i = 0; i < num_shared; ++i) {
    int p = shared_pages[i];
    ++s->ref[p];
    r.pages.push_back(p);
  }
  r.prefilled = num_shared * s->page_size;
  s->requests.emplace(request_id, std::move(r));
  s->waiting.push_back(request_id);
  return 0;
}

int sched_add_request(void* h, int request_id, int prompt_len,
                      int max_new_tokens) {
  return sched_add_request_shared(h, request_id, prompt_len, max_new_tokens,
                                  0, nullptr);
}

// Pin/unpin live pages (prefix-cache registry holds a reference so a page
// survives its owning request). Returns the number actually (un)pinned.
int sched_pin_pages(void* h, int n, const int* page_ids) {
  auto* s = static_cast<Scheduler*>(h);
  int done = 0;
  for (int i = 0; i < n; ++i) {
    int p = page_ids[i];
    if (p < 0 || p >= s->num_pages || s->ref[p] == 0) continue;  // not live
    ++s->ref[p];
    ++done;
  }
  return done;
}

int sched_unpin_pages(void* h, int n, const int* page_ids) {
  auto* s = static_cast<Scheduler*>(h);
  int done = 0;
  for (int i = 0; i < n; ++i) {
    int p = page_ids[i];
    if (p < 0 || p >= s->num_pages || s->ref[p] == 0) continue;
    s->decref(p);
    ++done;
  }
  return done;
}

// Assemble the next step. Returns the number of batch entries written (n).
// *kind: 0 = idle, 1 = prefill chunk batch, 2 = decode batch.
// Arrays (caller-allocated, length >= max_batch):
//   batch_ids[i]      request id of entry i
//   positions[i]      start position of this entry's tokens
//   chunk_lens[i]     number of prompt tokens in this chunk (prefill; 1 for
//                     decode)
//   cache_seqlens[i]  tokens already in the cache for this entry
//   block_tables      (max_batch, max_pages_per_seq) row-major page ids
int sched_next_batch(void* h, int* kind, int* batch_ids, int* positions,
                     int* chunk_lens, int* block_tables, int* cache_seqlens) {
  auto* s = static_cast<Scheduler*>(h);
  *kind = 0;

  // Admit waiting requests while pages for their first chunk exist.
  while (!s->waiting.empty()) {
    Request& r = s->requests.at(s->waiting.front());
    int first = std::min(r.prompt_len, r.prefilled + s->chunk_size);
    if (!s->ensure_pages(r, first)) break;
    r.state = r.prefilled < r.prompt_len ? PREFILLING : RUNNING;
    s->active.push_back(r.id);
    s->waiting.pop_front();
  }

  auto emit = [&](int i, Request& r, int pos, int len) {
    batch_ids[i] = r.id;
    positions[i] = pos;
    chunk_lens[i] = len;
    cache_seqlens[i] = pos;
    int* row = block_tables + (int64_t)i * s->max_pages_per_seq;
    // Unallocated entries are -1 so the engine can redirect stray writes
    // (padded chunk tails / padded batch slots) to a trash page.
    std::fill(row, row + s->max_pages_per_seq, -1);
    for (size_t j = 0; j < r.pages.size(); ++j) row[j] = r.pages[j];
  };

  // Prefill has priority (shortest-remaining-first = LPT on the complement;
  // keeps time-to-first-token low like the reference's LPT sort balances
  // splits).
  std::vector<int> prefilling;
  for (int id : s->active) {
    Request& r = s->requests.at(id);
    if (r.state == PREFILLING) prefilling.push_back(id);
  }
  if (!prefilling.empty()) {
    std::sort(prefilling.begin(), prefilling.end(), [&](int a, int b) {
      const Request& ra = s->requests.at(a);
      const Request& rb = s->requests.at(b);
      int rem_a = ra.prompt_len - ra.prefilled;
      int rem_b = rb.prompt_len - rb.prefilled;
      if (rem_a != rem_b) return rem_a < rem_b;
      return a < b;
    });
    int n = 0;
    for (int id : prefilling) {
      if (n >= s->max_batch) break;
      Request& r = s->requests.at(id);
      int len = std::min(s->chunk_size, r.prompt_len - r.prefilled);
      s->evict_window(r, r.prefilled);
      if (!s->ensure_pages(r, r.prefilled + len)) continue;
      emit(n, r, r.prefilled, len);
      r.prefilled += len;
      if (r.prefilled >= r.prompt_len) r.state = RUNNING;
      ++n;  // batch up to max_batch prefill chunks per step
    }
    if (n > 0) {
      *kind = 1;
      return n;
    }
  }

  // Decode batch over running sequences. With multi-step decode
  // (decode_depth > 1) each entry is planned for `depth` tokens — pages are
  // ensured up front and the engine reports how many were actually kept
  // (EOS / max_new may truncate).
  int n = 0;
  for (int id : s->active) {
    if (n >= s->max_batch) break;
    Request& r = s->requests.at(id);
    if (r.state != RUNNING) continue;
    int depth = s->decode_depth;
    int remaining = r.max_new_tokens - r.generated;
    if (depth > remaining) depth = remaining;
    if (depth < 1) depth = 1;
    s->evict_window(r, s->total_len(r));
    if (!s->ensure_pages(r, s->total_len(r) + depth)) continue;
    emit(n, r, s->total_len(r), depth);
    ++n;
  }
  if (n > 0) *kind = 2;
  return n;
}

void sched_set_decode_depth(void* h, int depth) {
  static_cast<Scheduler*>(h)->decode_depth = depth < 1 ? 1 : depth;
}

void sched_set_window(void* h, int window_tokens) {
  static_cast<Scheduler*>(h)->window_tokens =
      window_tokens < 0 ? 0 : window_tokens;
}

// Report step results: for each entry, one token was produced (decode) or a
// chunk finished (prefill; produced==0). done != 0 finishes the request and
// frees its pages.
void sched_report(void* h, int n, const int* req_ids, const int* produced,
                  const int* done) {
  auto* s = static_cast<Scheduler*>(h);
  for (int i = 0; i < n; ++i) {
    auto it = s->requests.find(req_ids[i]);
    if (it == s->requests.end()) continue;
    Request& r = it->second;
    r.generated += produced[i];
    bool finished = done[i] != 0 || r.generated >= r.max_new_tokens;
    if (finished && r.state != DONE) {
      r.state = DONE;
      s->release(r);
      s->active.erase(
          std::find(s->active.begin(), s->active.end(), r.id));
    }
  }
}

int sched_num_free_pages(void* h) {
  return (int)static_cast<Scheduler*>(h)->free_pages.size();
}

int sched_request_state(void* h, int req_id) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(req_id);
  if (it == s->requests.end()) return -1;
  return (int)it->second.state;
}

int sched_num_active(void* h) {
  return (int)static_cast<Scheduler*>(h)->active.size();
}

}  // extern "C"
