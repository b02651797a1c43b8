// Multi-tenant approximate radix tree for cache-aware routing.
//
// C++ counterpart of the reference router's Rust tree
// (sgl-router/src/tree.rs, ~1.5k LoC): maps recently seen request
// prefixes to the workers ("tenants") whose KV caches already hold them.
//
//  * prefix_match(text) -> (matched_len, tenant): walks the tree as far
//    as bytes match and returns the most-recently-used tenant on the
//    deepest node that has any tenant, refreshing its recency stamps up
//    the path (tree.rs prefix_match + access-time touch).
//  * insert(text, tenant): radix insert with edge splitting; per-tenant
//    character accounting (a node's bytes count once per tenant).
//  * evict_tenant(tenant, max_chars): LRU leaf eviction for ONE tenant
//    until its footprint fits (tree.rs eviction priority queue).
//  * remove_tenant(tenant): drop a dead worker everywhere.
//
// Exposed through a minimal C ABI (loaded via ctypes — the environment
// has no pybind11); a std::mutex serializes mutations so the asyncio
// router can call from any thread.

#include <cstddef>
#include <cstdint>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Node {
  Node* parent = nullptr;
  std::string text;                       // edge label from parent
  std::map<unsigned char, std::unique_ptr<Node>> children;
  std::unordered_map<int, uint64_t> tenants;  // tenant -> last access tick

  bool tenant_leaf(int t) const {
    // no descendant carries this tenant
    for (const auto& kv : children) {
      if (kv.second->tenants.count(t)) return false;
      if (!kv.second->tenant_leaf(t)) return false;
    }
    return true;
  }
};

class Tree {
 public:
  Tree() = default;

  size_t prefix_match(const char* data, size_t len, int* out_tenant) {
    std::lock_guard<std::mutex> g(mu_);
    Node* cur = &root_;
    size_t pos = 0;
    Node* best = nullptr;
    size_t best_len = 0;
    while (pos < len) {
      auto it = cur->children.find((unsigned char)data[pos]);
      if (it == cur->children.end()) break;
      Node* child = it->second.get();
      size_t i = 0, n = child->text.size();
      while (i < n && pos + i < len && child->text[i] == data[pos + i]) i++;
      if (i < n) {  // partial edge match: stop at pos+i, node not reached
        if (!child->tenants.empty() && i > 0) {
          // partial credit only if the edge fully matched; it didn't,
          // so the last fully-reached tenant node stays `best`
        }
        break;
      }
      pos += n;
      cur = child;
      if (!cur->tenants.empty()) {
        best = cur;
        best_len = pos;
      }
    }
    if (!best) {
      *out_tenant = -1;
      return 0;
    }
    // most-recently-used tenant at the deepest tenant node
    int tenant = -1;
    uint64_t ts = 0;
    for (const auto& kv : best->tenants) {
      if (tenant < 0 || kv.second > ts) {
        tenant = kv.first;
        ts = kv.second;
      }
    }
    // refresh recency along the path root..best for that tenant
    uint64_t now = ++clock_;
    for (Node* n = best; n && n->parent; n = n->parent) {
      auto it = n->tenants.find(tenant);
      if (it != n->tenants.end()) it->second = now;
    }
    *out_tenant = tenant;
    return best_len;
  }

  void insert(const char* data, size_t len, int tenant) {
    std::lock_guard<std::mutex> g(mu_);
    uint64_t now = ++clock_;
    Node* cur = &root_;
    size_t pos = 0;
    while (pos < len) {
      auto it = cur->children.find((unsigned char)data[pos]);
      if (it == cur->children.end()) {
        auto node = std::make_unique<Node>();
        node->parent = cur;
        node->text.assign(data + pos, len - pos);
        node->tenants[tenant] = now;
        count_[tenant] += (long)(len - pos);
        cur->children[(unsigned char)data[pos]] = std::move(node);
        return;
      }
      Node* child = it->second.get();
      size_t i = 0, n = child->text.size();
      while (i < n && pos + i < len && child->text[i] == data[pos + i]) i++;
      if (i < n) {
        // split the edge at i: child keeps tail, new mid holds head
        auto mid = std::make_unique<Node>();
        mid->parent = cur;
        mid->text = child->text.substr(0, i);
        mid->tenants = child->tenants;  // everyone who had child has mid
        // per-tenant counts are unchanged: n bytes split into i + (n - i)
        child->text = child->text.substr(i);
        std::unique_ptr<Node> child_owned = std::move(it->second);
        child_owned->parent = mid.get();
        mid->children[(unsigned char)child_owned->text[0]] =
            std::move(child_owned);
        Node* mid_raw = mid.get();
        cur->children[(unsigned char)mid_raw->text[0]] = std::move(mid);
        child = mid_raw;
        n = i;
      }
      // child fully matched for its first n chars
      if (!child->tenants.count(tenant)) count_[tenant] += (long)n;
      child->tenants[tenant] = now;
      pos += n;
      cur = child;
    }
  }

  long tenant_size(int tenant) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = count_.find(tenant);
    return it == count_.end() ? 0 : it->second;
  }

  int smallest_tenant() {
    std::lock_guard<std::mutex> g(mu_);
    int best = -1;
    long sz = 0;
    for (const auto& kv : count_) {
      if (best < 0 || kv.second < sz) {
        best = kv.first;
        sz = kv.second;
      }
    }
    return best;
  }

  void evict_tenant(int tenant, long max_chars) {
    std::lock_guard<std::mutex> g(mu_);
    while (count_.count(tenant) && count_[tenant] > max_chars) {
      Node* lru = nullptr;
      uint64_t ts = 0;
      find_lru_leaf(&root_, tenant, &lru, &ts);
      if (!lru) break;
      drop_tenant_node(lru, tenant);
    }
  }

  void remove_tenant(int tenant) {
    std::lock_guard<std::mutex> g(mu_);
    remove_rec(&root_, tenant);
    count_.erase(tenant);
  }

  long node_count() {
    std::lock_guard<std::mutex> g(mu_);
    return count_nodes(&root_) - 1;  // exclude root
  }

 private:
  void find_lru_leaf(Node* n, int tenant, Node** best, uint64_t* ts) {
    for (auto& kv : n->children) {
      Node* c = kv.second.get();
      auto it = c->tenants.find(tenant);
      if (it != c->tenants.end()) {
        bool leaf = true;
        for (auto& gk : c->children)
          if (subtree_has(gk.second.get(), tenant)) {
            leaf = false;
            break;
          }
        if (leaf && (!*best || it->second < *ts)) {
          *best = c;
          *ts = it->second;
        }
      }
      find_lru_leaf(c, tenant, best, ts);
    }
  }

  bool subtree_has(Node* n, int tenant) {
    if (n->tenants.count(tenant)) return true;
    for (auto& kv : n->children)
      if (subtree_has(kv.second.get(), tenant)) return true;
    return false;
  }

  void drop_tenant_node(Node* n, int tenant) {
    if (n->tenants.erase(tenant)) count_[tenant] -= (long)n->text.size();
    // prune nodes that carry no tenant and no children
    while (n && n != &root_ && n->tenants.empty() && n->children.empty()) {
      Node* p = n->parent;
      p->children.erase((unsigned char)n->text[0]);
      n = p;
    }
  }

  void remove_rec(Node* n, int tenant) {
    for (auto it = n->children.begin(); it != n->children.end();) {
      Node* c = it->second.get();
      c->tenants.erase(tenant);
      remove_rec(c, tenant);
      if (c->tenants.empty() && c->children.empty())
        it = n->children.erase(it);
      else
        ++it;
    }
  }

  long count_nodes(Node* n) {
    long c = 1;
    for (auto& kv : n->children) c += count_nodes(kv.second.get());
    return c;
  }

  Node root_;
  std::unordered_map<int, long> count_;
  uint64_t clock_ = 0;
  std::mutex mu_;
};

}  // namespace

extern "C" {

void* rtree_new() { return new Tree(); }
void rtree_free(void* h) { delete static_cast<Tree*>(h); }

void rtree_insert(void* h, const char* data, size_t len, int tenant) {
  static_cast<Tree*>(h)->insert(data, len, tenant);
}

size_t rtree_prefix_match(void* h, const char* data, size_t len,
                          int* out_tenant) {
  return static_cast<Tree*>(h)->prefix_match(data, len, out_tenant);
}

long rtree_tenant_size(void* h, int tenant) {
  return static_cast<Tree*>(h)->tenant_size(tenant);
}

int rtree_smallest_tenant(void* h) {
  return static_cast<Tree*>(h)->smallest_tenant();
}

void rtree_evict_tenant(void* h, int tenant, long max_chars) {
  static_cast<Tree*>(h)->evict_tenant(tenant, max_chars);
}

void rtree_remove_tenant(void* h, int tenant) {
  static_cast<Tree*>(h)->remove_tenant(tenant);
}

long rtree_node_count(void* h) {
  return static_cast<Tree*>(h)->node_count();
}

}  // extern "C"
