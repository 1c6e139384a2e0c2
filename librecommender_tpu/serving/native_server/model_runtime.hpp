// model_runtime.hpp — endpoint-level model/online scoring on top of the
// jaxpr interpreter (jaxpr_interp.hpp).
//
// Loads the artifacts written by serving/native_program.py
// (export_native_programs): the score_all / score_dyn / user_repr
// programs, user feature rows, the raw-value -> flat-index feature maps
// and (dyn family) the item matrix + stored recent histories. Assembles
// request-time override rows exactly like the Python
// FeatureTables.build_user_sparse_row / _convert_request_seq, runs the
// program in-process and returns raw catalog scores — the C++ analog of
// the reference's online_deploy feature assembly + TF Serving scoring hop
// (reference libserving/sanic_serving/online_deploy.py:25,
// actix_serving/src/online_deploy_grpc.rs:38), with the network hop
// removed.
#pragma once

#include <cstdio>
#include <optional>

#include "jaxpr_interp.hpp"

namespace jxi {

struct FeatCol {
  int pos = 0;
  int64_t oov = 0;
  std::map<std::string, int64_t> values;  // raw value (string form) -> idx
};

struct ModelRuntime {
  bool loaded = false;
  std::string kind;                     // "feat" | "dyn"
  std::vector<std::string> inputs;      // program input order
  int64_t n_users = 0, n_items = 0, pad_id = 0;
  int64_t max_seq_len = 0, long_max_len = 0;
  bool has_bias = false;

  std::optional<Program> score_all, score_dyn, user_repr;
  // (n_users + 1, F) stored user feature rows
  std::vector<int32_t> user_sparse_rows;
  int64_t n_sparse_cols = 0;
  std::vector<float> user_dense_rows;
  int64_t n_dense_cols = 0;
  std::map<std::string, FeatCol> sparse_map;
  std::map<std::string, int> dense_map;
  // dyn family
  std::vector<float> item_repr;
  int64_t item_dim = 0;
  std::vector<int32_t> recent_seq;      // (n_users + 1, L)
  std::map<int64_t, int32_t> item2id;   // raw item -> inner id

  static std::string slurp(const std::string& p) {
    std::ifstream f(p, std::ios::binary);
    if (!f) return "";
    return std::string((std::istreambuf_iterator<char>(f)),
                       std::istreambuf_iterator<char>());
  }

  template <typename T>
  static std::vector<T> bin(const std::string& p) {
    const std::string raw = slurp(p);
    std::vector<T> out(raw.size() / sizeof(T));
    std::memcpy(out.data(), raw.data(), out.size() * sizeof(T));
    return out;
  }

  bool load(const std::string& dir,
            const std::vector<int64_t>& id2item_ints) {
    const std::string meta_text = slurp(dir + "/runtime_meta.json");
    if (meta_text.empty()) return false;
    JV meta = JsonParser(meta_text).parse();
    kind = meta.at("kind").str;
    for (const auto& v : meta.at("inputs").arr) inputs.push_back(v.str);
    n_users = meta.at("n_users").asi();
    n_items = meta.at("n_items").asi();
    pad_id = meta.at("pad_id").asi();
    if (meta.find("max_seq_len")) max_seq_len = meta.at("max_seq_len").asi();
    if (meta.find("long_max_len")) long_max_len = meta.at("long_max_len").asi();
    if (meta.find("has_bias")) has_bias = meta.at("has_bias").boo;

    auto try_load = [&](const char* name) -> std::optional<Program> {
      const std::string pj = dir + "/" + name + ".program.json";
      if (slurp(pj).empty()) return std::nullopt;
      return load_program(pj, dir + "/" + std::string(name) + ".blob.bin");
    };
    score_all = try_load("score_all");
    score_dyn = try_load("score_dyn");
    user_repr = try_load("user_repr");

    const auto sshape = bin<int64_t>(dir + "/user_sparse_rows_shape.bin");
    if (sshape.size() == 2) {
      user_sparse_rows = bin<int32_t>(dir + "/user_sparse_rows.bin");
      n_sparse_cols = sshape[1];
    }
    const auto dshape = bin<int64_t>(dir + "/user_dense_rows_shape.bin");
    if (dshape.size() == 2) {
      user_dense_rows = bin<float>(dir + "/user_dense_rows.bin");
      n_dense_cols = dshape[1];
    }
    const std::string fm = slurp(dir + "/feat_map.json");
    if (!fm.empty()) {
      JV fmap = JsonParser(fm).parse();
      for (const auto& kv : fmap.at("sparse").obj) {
        FeatCol col;
        col.pos = int(kv.second.at("pos").asi());
        col.oov = kv.second.at("oov").asi();
        for (const auto& vv : kv.second.at("values").obj)
          col.values[vv.first] = vv.second.asi();
        sparse_map[kv.first] = std::move(col);
      }
      for (const auto& kv : fmap.at("dense").obj)
        dense_map[kv.first] = int(kv.second.asi());
    }
    if (kind == "dyn") {
      const auto ishape = bin<int64_t>(dir + "/item_repr_shape.bin");
      if (ishape.size() != 2) return false;
      item_repr = bin<float>(dir + "/item_repr.bin");
      item_dim = ishape[1];
      recent_seq = bin<int32_t>(dir + "/recent_seq.bin");
    } else if (kind == "dyn_feats") {
      // TwoTower family: scores = tower(u, feats) . item_embeds rows
      // (the embed-family export; includes a trailing OOV row)
      const auto ishape = bin<int64_t>(dir + "/item_embed_shape.bin");
      if (ishape.size() != 2) return false;
      item_repr = bin<float>(dir + "/item_embed.bin");
      item_dim = ishape[1];
    } else {
      stored_short_rows = bin<int32_t>(dir + "/recent_seq.bin");
      stored_long_rows = bin<int32_t>(dir + "/recent_long.bin");
    }
    for (size_t i = 0; i < id2item_ints.size(); ++i)
      item2id[id2item_ints[i]] = int32_t(i);
    loaded = (kind == "feat" && score_all.has_value()) ||
             ((kind == "dyn" || kind == "dyn_feats") &&
              user_repr.has_value());
    return loaded;
  }

  static Tensor users_tensor(int64_t uid) {
    Tensor t;
    t.dt = DT::I32;
    t.shape = {1};
    t.i = {uid};
    return t;
  }

  // ---- feature-row assembly (FeatureTables.build_user_*_row analog)
  Tensor sparse_row_for(int64_t uid, const JV* feats) const {
    Tensor t;
    t.dt = DT::I32;
    t.shape = {1, n_sparse_cols};
    t.i.resize(n_sparse_cols);
    const int64_t row = std::min<int64_t>(uid, n_users);
    for (int64_t j = 0; j < n_sparse_cols; ++j)
      t.i[j] = user_sparse_rows[row * n_sparse_cols + j];
    if (feats) {
      for (const auto& kv : feats->obj) {
        auto it = sparse_map.find(kv.first);
        if (it == sparse_map.end()) continue;
        const FeatCol& col = it->second;
        std::string key;
        if (kv.second.t == JV::STR) {
          key = kv.second.str;
        } else if (kv.second.t == JV::NUM) {
          // integer-valued numbers print without a decimal point, matching
          // Python's str() of the original raw value
          const double v = kv.second.num;
          if (v == int64_t(v)) key = std::to_string(int64_t(v));
          else { char b[64]; std::snprintf(b, 64, "%g", v); key = b; }
        } else if (kv.second.t == JV::BOO) {
          key = kv.second.boo ? "True" : "False";
        }
        auto vit = col.values.find(key);
        t.i[col.pos] = vit == col.values.end() ? col.oov : vit->second;
      }
    }
    return t;
  }

  Tensor dense_row_for(int64_t uid, const JV* feats) const {
    Tensor t;
    t.dt = DT::F32;
    t.shape = {1, n_dense_cols};
    t.f.resize(n_dense_cols);
    const int64_t row = std::min<int64_t>(uid, n_users);
    for (int64_t j = 0; j < n_dense_cols; ++j)
      t.f[j] = user_dense_rows[row * n_dense_cols + j];
    if (feats) {
      for (const auto& kv : feats->obj) {
        auto it = dense_map.find(kv.first);
        if (it == dense_map.end() || kv.second.t != JV::NUM) continue;
        t.f[it->second] = float(kv.second.num);
      }
    }
    return t;
  }

  // raw request seq -> right-aligned padded inner ids (len L)
  Tensor seq_tensor(const std::vector<int64_t>& raw_seq, int64_t L) const {
    Tensor t;
    t.dt = DT::I32;
    t.shape = {1, L};
    t.i.assign(L, pad_id);
    std::vector<int64_t> inner;
    for (const auto r : raw_seq) {
      auto it = item2id.find(r);
      if (it != item2id.end()) inner.push_back(it->second);
    }
    const int64_t take = std::min<int64_t>(L, int64_t(inner.size()));
    for (int64_t j = 0; j < take; ++j)
      t.i[L - take + j] = inner[inner.size() - take + j];
    return t;
  }

  Tensor stored_seq(int64_t uid, const std::vector<int32_t>& table,
                    int64_t L) const {
    Tensor t;
    t.dt = DT::I32;
    t.shape = {1, L};
    t.i.assign(L, pad_id);
    const int64_t row = std::min<int64_t>(uid, n_users);
    if (!table.empty())
      for (int64_t j = 0; j < L; ++j) t.i[j] = table[row * L + j];
    return t;
  }

  // ---- scoring entry points. uid == n_users means cold/OOV.
  // Returns (n_items,) raw scores.
  std::vector<float> scores_static(int64_t uid) const {
    if (kind == "dyn") return scores_dyn_family(uid, nullptr);
    if (kind == "dyn_feats") return scores_tower_feats(uid, nullptr);
    Executor ex(*score_all);
    auto outs = ex.run({users_tensor(uid)});
    return std::vector<float>(outs[0].f.begin(), outs[0].f.end());
  }

  // feats: parsed flat JSON object or nullptr; raw_seq: request item ids
  // (empty = use stored history).
  std::vector<float> scores_online(int64_t uid, const JV* feats,
                                   const std::vector<int64_t>& raw_seq) const {
    if (kind == "dyn")
      return scores_dyn_family(uid, raw_seq.empty() ? nullptr : &raw_seq);
    if (kind == "dyn_feats") return scores_tower_feats(uid, feats);
    if (!score_dyn.has_value()) return scores_static(uid);
    std::vector<Tensor> args;
    for (const auto& name : inputs) {
      if (name == "users") {
        args.push_back(users_tensor(uid));
      } else if (name == "seq") {
        args.push_back(raw_seq.empty() ? stored_short_seq(uid)
                                       : seq_tensor(raw_seq, max_seq_len));
      } else if (name == "seq_long") {
        args.push_back(raw_seq.empty() ? stored_long_seq(uid)
                                       : seq_tensor(raw_seq, long_max_len));
      } else if (name == "user_sparse_row") {
        args.push_back(sparse_row_for(uid, feats));
      } else if (name == "user_dense_row") {
        args.push_back(dense_row_for(uid, feats));
      } else {
        throw std::runtime_error("unknown program input " + name);
      }
    }
    Executor ex(*score_dyn);
    auto outs = ex.run(std::move(args));
    return std::vector<float>(outs[0].f.begin(), outs[0].f.end());
  }

  // Stored short/long histories for the feat family come from the
  // program's baked tables only when the request has no seq — but the
  // score_dyn program takes seq as an INPUT, so the server must supply
  // the stored rows; they are exported per-family:
  std::vector<int32_t> stored_short_rows, stored_long_rows;

  Tensor stored_short_seq(int64_t uid) const {
    return stored_seq(uid, stored_short_rows, max_seq_len);
  }
  Tensor stored_long_seq(int64_t uid) const {
    return stored_seq(uid, stored_long_rows, long_max_len);
  }

  // TwoTower family: user tower with override rows, then dot with the
  // exported item-embedding matrix.
  std::vector<float> scores_tower_feats(int64_t uid, const JV* feats) const {
    std::vector<Tensor> args;
    for (const auto& name : inputs) {
      if (name == "users") args.push_back(users_tensor(uid));
      else if (name == "user_sparse_row") args.push_back(sparse_row_for(uid, feats));
      else if (name == "user_dense_row") args.push_back(dense_row_for(uid, feats));
      else throw std::runtime_error("unknown tower input " + name);
    }
    Executor ex(*user_repr);
    auto outs = ex.run(std::move(args));
    const std::vector<float>& u = outs[0].f;
    if (int64_t(u.size()) != item_dim)
      throw std::runtime_error("tower dim mismatch");
    std::vector<float> scores(n_items);
    for (int64_t i = 0; i < n_items; ++i) {
      const float* row = item_repr.data() + i * item_dim;
      float acc = 0.f;
      for (int64_t d = 0; d < item_dim; ++d) acc += u[d] * row[d];
      scores[i] = acc;
    }
    return scores;
  }

  std::vector<float> scores_dyn_family(
      int64_t uid, const std::vector<int64_t>* raw_seq) const {
    Tensor seq = raw_seq ? seq_tensor(*raw_seq, max_seq_len)
                         : stored_seq(uid, recent_seq, max_seq_len);
    Executor ex(*user_repr);
    auto outs = ex.run({users_tensor(uid), std::move(seq)});
    std::vector<float> u(outs[0].f.begin(), outs[0].f.end());
    if (has_bias) u.push_back(1.0f);
    if (int64_t(u.size()) != item_dim)
      throw std::runtime_error("user repr dim mismatch");
    std::vector<float> scores(n_items);
    for (int64_t i = 0; i < n_items; ++i) {
      const float* row = item_repr.data() + i * item_dim;
      float acc[8] = {0.f};
      int64_t d = 0;
      for (; d + 8 <= item_dim; d += 8)
        for (int j = 0; j < 8; ++j) acc[j] += u[d + j] * row[d + j];
      float tail = 0.f;
      for (; d < item_dim; ++d) tail += u[d] * row[d];
      scores[i] = ((acc[0] + acc[4]) + (acc[1] + acc[5])) +
                  ((acc[2] + acc[6]) + (acc[3] + acc[7])) + tail;
    }
    return scores;
  }
};

}  // namespace jxi
