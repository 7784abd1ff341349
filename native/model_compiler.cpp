// tsim native model compiler
// ---------------------------
// C++ implementation of the scene front-end (the reference keeps its model
// compiler in the C++ DiffRedMax core, SURVEY.md C1): parses redmax XML scene
// files plus sidecar assets (contact-point .txt, tactile spec .txt),
// generates contact point clouds and tactile marker grids, computes primitive
// mass/inertia, and emits flattened arrays through a C ABI consumed from
// Python via ctypes (tactilesimulation_tpu/model/native.py).
//
// Cross-validated against the Python reference implementation in
// tests/test_native_compiler.py on every reference scene.
//
// Build: cd native && cmake -B build && cmake --build build
// No external dependencies: includes a minimal XML parser sufficient for the
// redmax schema (elements, attributes, comments; no entities/CDATA).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace tsim {

// ---------------------------------------------------------------------------
// minimal XML
// ---------------------------------------------------------------------------
struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const std::string *attr(const std::string &k) const {
    auto it = attrs.find(k);
    return it == attrs.end() ? nullptr : &it->second;
  }
  std::vector<const XmlNode *> find_all(const std::string &t) const {
    std::vector<const XmlNode *> out;
    for (auto &c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  const XmlNode *find(const std::string &t) const {
    for (auto &c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
};

class XmlParser {
 public:
  // takes ownership of the text: callers often pass temporaries
  explicit XmlParser(std::string text) : s_(std::move(text)), i_(0) {}

  std::unique_ptr<XmlNode> parse() {
    skip_misc();
    return parse_element();
  }

 private:
  const std::string s_;
  size_t i_;

  void error(const std::string &msg) {
    throw std::runtime_error("XML parse error at offset " +
                             std::to_string(i_) + ": " + msg);
  }
  bool starts(const char *p) { return s_.compare(i_, strlen(p), p) == 0; }
  void skip_ws() {
    while (i_ < s_.size() && isspace((unsigned char)s_[i_])) i_++;
  }
  void skip_misc() {  // whitespace, comments, <?...?>, stray text
    for (;;) {
      skip_ws();
      if (starts("<!--")) {
        size_t e = s_.find("-->", i_);
        if (e == std::string::npos) error("unterminated comment");
        i_ = e + 3;
      } else if (starts("<?")) {
        size_t e = s_.find("?>", i_);
        if (e == std::string::npos) error("unterminated PI");
        i_ = e + 2;
      } else if (i_ < s_.size() && s_[i_] != '<') {
        i_++;  // tolerate stray text (e.g. "</default>f" in stable_grasp.xml)
      } else {
        return;
      }
    }
  }
  std::string parse_name() {
    size_t b = i_;
    while (i_ < s_.size() &&
           (isalnum((unsigned char)s_[i_]) || s_[i_] == '_' || s_[i_] == '-'))
      i_++;
    if (i_ == b) error("expected name");
    return s_.substr(b, i_ - b);
  }
  std::unique_ptr<XmlNode> parse_element() {
    if (i_ >= s_.size() || s_[i_] != '<') error("expected '<'");
    i_++;
    auto node = std::make_unique<XmlNode>();
    node->tag = parse_name();
    for (;;) {
      skip_ws();
      if (i_ >= s_.size()) error("unexpected EOF in tag");
      if (s_[i_] == '/') {
        i_++;
        if (s_[i_] != '>') error("expected '>' after '/'");
        i_++;
        return node;  // self-closing
      }
      if (s_[i_] == '>') {
        i_++;
        break;
      }
      std::string key = parse_name();
      skip_ws();
      if (s_[i_] != '=') error("expected '=' after attribute name");
      i_++;
      skip_ws();
      char quote = s_[i_];
      if (quote != '"' && quote != '\'') error("expected quote");
      i_++;
      size_t e = s_.find(quote, i_);
      if (e == std::string::npos) error("unterminated attribute");
      node->attrs[key] = s_.substr(i_, e - i_);
      i_ = e + 1;
    }
    // children until matching close tag
    for (;;) {
      skip_misc();
      if (starts("</")) {
        i_ += 2;
        std::string close = parse_name();
        if (close != node->tag) error("mismatched close tag " + close);
        skip_ws();
        if (s_[i_] != '>') error("expected '>'");
        i_++;
        return node;
      }
      node->children.push_back(parse_element());
    }
  }
};

// ---------------------------------------------------------------------------
// math helpers
// ---------------------------------------------------------------------------
using Vec3 = std::array<double, 3>;
using Vec4 = std::array<double, 4>;

static std::vector<double> parse_floats(const std::string &s) {
  std::vector<double> out;
  std::istringstream is(s);
  double v;
  while (is >> v) out.push_back(v);
  return out;
}

static Vec3 vec3_of(const std::string *s, Vec3 dflt) {
  if (!s) return dflt;
  auto v = parse_floats(*s);
  return {v[0], v[1], v[2]};
}

static Vec4 quat_of(const std::string *s) {
  if (!s) return {1, 0, 0, 0};
  auto v = parse_floats(*s);
  double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + v[3] * v[3]);
  if (n <= 0) return {1, 0, 0, 0};
  return {v[0] / n, v[1] / n, v[2] / n, v[3] / n};
}

static void quat_rotate(const Vec4 &q, const double *v, double *out) {
  const double w = q[0], x = q[1], y = q[2], z = q[3];
  // t = 2 u x v ; out = v + w t + u x t
  double tx = 2 * (y * v[2] - z * v[1]);
  double ty = 2 * (z * v[0] - x * v[2]);
  double tz = 2 * (x * v[1] - y * v[0]);
  out[0] = v[0] + w * tx + (y * tz - z * ty);
  out[1] = v[1] + w * ty + (z * tx - x * tz);
  out[2] = v[2] + w * tz + (x * ty - y * tx);
}

static Vec4 quat_mul(const Vec4 &a, const Vec4 &b) {
  return {a[0] * b[0] - a[1] * b[1] - a[2] * b[2] - a[3] * b[3],
          a[0] * b[1] + a[1] * b[0] + a[2] * b[3] - a[3] * b[2],
          a[0] * b[2] - a[1] * b[3] + a[2] * b[0] + a[3] * b[1],
          a[0] * b[3] + a[1] * b[2] - a[2] * b[1] + a[3] * b[0]};
}

static Vec4 quat_conj(const Vec4 &q) { return {q[0], -q[1], -q[2], -q[3]}; }

// ---------------------------------------------------------------------------
// model arrays (C ABI)
// ---------------------------------------------------------------------------
enum JointType {
  J_FIXED = 0, J_REVOLUTE = 1, J_PRISMATIC = 2, J_PLANAR = 3,
  J_TRANSLATIONAL = 4, J_FREE_EXP = 5, J_FREE_EULER = 6
};
enum GeomType { G_CUBOID = 0, G_CYLINDER = 1, G_SPHERE = 2, G_MESH = 3,
                G_ABSTRACT = 4 };

static int joint_ndof(int jt) {
  switch (jt) {
    case J_FIXED: return 0;
    case J_REVOLUTE: case J_PRISMATIC: return 1;
    case J_PLANAR: return 2;
    case J_TRANSLATIONAL: return 3;
    default: return 6;
  }
}

struct Model {
  // scalars
  double timestep = 5e-3;
  int integrator = 1;  // 1 = BDF1, 2 = BDF2
  double gravity[3] = {0, 0, -9.8};
  int has_ground = 0;
  double ground_pos[3] = {0, 0, 0};
  double ground_normal[3] = {0, 0, 1};
  double solver_tol = 1e-9;
  int solver_max_iter = 10;
  // joints
  std::vector<int> joint_type, joint_parent;
  std::vector<double> joint_pos, joint_quat, joint_axis0, joint_axis1;
  std::vector<double> joint_damping, joint_lim_lower, joint_lim_upper,
      joint_lim_stiffness;
  std::vector<std::string> joint_names;
  // bodies
  std::vector<int> body_gtype, body_joint;
  std::vector<double> body_pos, body_quat, body_size, body_mass, body_inertia;
  std::vector<std::string> body_names;
  // contact points (per body, in joint frame)
  std::vector<double> cp_pos;
  std::vector<int> cp_body;
  // pairs
  std::vector<int> pair_general, pair_primitive;
  std::vector<double> pair_params;  // kn kt mu damping
  // motors
  std::vector<int> motor_joint, motor_is_position;
  std::vector<double> motor_P, motor_D, motor_lo, motor_hi;
  // tactile
  std::vector<int> tac_body, tac_count;
  std::vector<double> tac_pos, tac_normal, tac_axis0, tac_axis1,
      tac_params;
  std::vector<int> tac_image_pos;
  std::vector<std::string> tac_names;
  // endeffectors
  std::vector<int> ee_joint;
  std::vector<double> ee_pos;
  std::vector<std::string> ee_names;

  int ndof_q() const {
    int n = 0;
    for (int t : joint_type) n += joint_ndof(t);
    return n;
  }
};

// ---------------------------------------------------------------------------
// compiler
// ---------------------------------------------------------------------------
struct Defaults {
  std::map<std::string, std::map<std::string, std::string>> by_tag;
  std::string get(const std::string &tag, const XmlNode *el,
                  const std::string &attr, const std::string &fb) const {
    if (el) {
      auto *a = el->attr(attr);
      if (a) return *a;
    }
    auto it = by_tag.find(tag);
    if (it != by_tag.end()) {
      auto jt = it->second.find(attr);
      if (jt != it->second.end()) return jt->second;
    }
    return fb;
  }
};

class Compiler {
 public:
  Compiler(const std::string &path, double mesh_fallback_extent)
      : mesh_extent_(mesh_fallback_extent) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open " + path);
    std::stringstream ss;
    ss << f.rdbuf();
    auto slash = path.find_last_of('/');
    base_dir_ = slash == std::string::npos ? "." : path.substr(0, slash);
    XmlParser parser(ss.str());
    root_ = parser.parse();
    if (root_->tag != "redmax") throw std::runtime_error("root not <redmax>");
  }

  Model compile() {
    Model m;
    for (auto *d : root_->find_all("default"))
      for (auto &c : d->children) defaults_.by_tag[c->tag] = c->attrs;

    if (auto *opt = root_->find("option")) {
      if (auto *a = opt->attr("timestep")) m.timestep = std::stod(*a);
      if (auto *a = opt->attr("integrator"))
        m.integrator = (*a == "BDF2") ? 2 : 1;
      if (auto *a = opt->attr("gravity")) {
        auto g = parse_floats(*a);
        for (int i = 0; i < 3; i++) m.gravity[i] = g[i];
      }
    }
    if (auto *so = root_->find("solver_option")) {
      if (auto *a = so->attr("tol")) m.solver_tol = std::stod(*a);
      if (auto *a = so->attr("max_iter"))
        m.solver_max_iter = std::min((int)std::stod(*a), 10);
    }
    if (auto *g = root_->find("ground")) {
      m.has_ground = 1;
      Vec3 p = vec3_of(g->attr("pos"), {0, 0, 0});
      Vec3 n = vec3_of(g->attr("normal"), {0, 0, 1});
      double nn = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
      for (int i = 0; i < 3; i++) {
        m.ground_pos[i] = p[i];
        m.ground_normal[i] = n[i] / nn;
      }
    }

    for (auto *robot : root_->find_all("robot"))
      for (auto *link : robot->find_all("link")) parse_link(m, link, -1);

    zero_config_frames(m);

    if (auto *contact = root_->find("contact")) {
      for (auto &el : contact->children) {
        if (el->tag == "ground_contact") {
          add_pair(m, el.get(), body_index(m, *el->attr("body")), -1);
        } else if (el->tag == "general_primitive_contact") {
          add_pair(m, el.get(), body_index(m, *el->attr("general_body")),
                   body_index(m, *el->attr("primitive_body")));
        }
      }
    }
    if (auto *act = root_->find("actuator")) {
      for (auto *el : act->find_all("motor")) {
        m.motor_joint.push_back(joint_index(m, *el->attr("joint")));
        std::string ctrl = el->attr("ctrl") ? *el->attr("ctrl") : "force";
        m.motor_is_position.push_back(ctrl == "position" ? 1 : 0);
        m.motor_P.push_back(std::stod(defaults_.get("motor", el, "P", "0")));
        m.motor_D.push_back(std::stod(defaults_.get("motor", el, "D", "0")));
        std::string rng = defaults_.get("motor", el, "ctrl_range", "");
        if (!rng.empty()) {
          auto v = parse_floats(rng);
          m.motor_lo.push_back(v[0]);
          m.motor_hi.push_back(v[1]);
        } else {
          m.motor_lo.push_back(-1e30);
          m.motor_hi.push_back(1e30);
        }
      }
    }
    if (auto *sens = root_->find("sensor")) {
      for (auto *el : sens->find_all("tactile")) parse_tactile(m, el);
    }
    if (auto *var = root_->find("variable")) {
      for (auto *el : var->find_all("endeffector")) {
        int j = joint_index(m, *el->attr("joint"));
        m.ee_joint.push_back(j);
        Vec3 p = vec3_of(el->attr("pos"), {0, 0, 0});
        for (double x : p) m.ee_pos.push_back(x);
        m.ee_names.push_back(el->attr("name") ? *el->attr("name")
                                              : *el->attr("joint"));
      }
    }
    return m;
  }

 private:
  std::unique_ptr<XmlNode> root_;
  Defaults defaults_;
  std::string base_dir_;
  double mesh_extent_;
  // per-body staged info
  struct BodyAux {
    bool pos_is_world = false;
    bool points_in_joint_frame = false;
    std::vector<double> raw_points;  // body (or joint) frame
    std::vector<int> cuboid_res;
    int angle_res = 0, radius_res = 0;
    double density = 1000.0;
  };
  std::vector<BodyAux> aux_;

  static int body_index(const Model &m, const std::string &name) {
    for (size_t i = 0; i < m.body_names.size(); i++)
      if (m.body_names[i] == name) return (int)i;
    throw std::runtime_error("no body " + name);
  }
  static int joint_index(const Model &m, const std::string &name) {
    for (size_t i = 0; i < m.joint_names.size(); i++)
      if (m.joint_names[i] == name) return (int)i;
    throw std::runtime_error("no joint " + name);
  }

  void add_pair(Model &m, const XmlNode *el, int gb, int pb) {
    m.pair_general.push_back(gb);
    m.pair_primitive.push_back(pb);
    m.pair_params.push_back(
        std::stod(defaults_.get("general_primitive_contact", el, "kn", "1e3")));
    m.pair_params.push_back(
        std::stod(defaults_.get("general_primitive_contact", el, "kt", "1.")));
    m.pair_params.push_back(
        std::stod(defaults_.get("general_primitive_contact", el, "mu", "0.8")));
    m.pair_params.push_back(std::stod(
        defaults_.get("general_primitive_contact", el, "damping", "0.")));
  }

  void parse_link(Model &m, const XmlNode *link, int parent) {
    const XmlNode *joint = link->find("joint");
    std::string jt = *joint->attr("type");
    int code = jt == "fixed"           ? J_FIXED
               : jt == "revolute"      ? J_REVOLUTE
               : jt == "prismatic"     ? J_PRISMATIC
               : jt == "planar"        ? J_PLANAR
               : jt == "translational" ? J_TRANSLATIONAL
               : jt == "free3d-exp"    ? J_FREE_EXP
               : jt == "free3d-euler"  ? J_FREE_EULER
                                       : -1;
    if (code < 0) throw std::runtime_error("unknown joint type " + jt);
    m.joint_type.push_back(code);
    m.joint_parent.push_back(parent);
    m.joint_names.push_back(*joint->attr("name"));
    Vec3 pos = vec3_of(joint->attr("pos"), {0, 0, 0});
    Vec4 q = quat_of(joint->attr("quat"));
    const std::string *ax = joint->attr("axis0");
    if (!ax) ax = joint->attr("axis");
    Vec3 a0 = vec3_of(ax, {1, 0, 0});
    Vec3 a1 = vec3_of(joint->attr("axis1"), {0, 1, 0});
    auto norm3 = [](Vec3 &v) {
      double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
      if (n > 0) for (auto &x : v) x /= n;
    };
    norm3(a0);
    norm3(a1);
    for (double x : pos) m.joint_pos.push_back(x);
    for (double x : q) m.joint_quat.push_back(x);
    for (double x : a0) m.joint_axis0.push_back(x);
    for (double x : a1) m.joint_axis1.push_back(x);
    m.joint_damping.push_back(
        std::stod(defaults_.get("joint", joint, "damping", "0")));
    if (auto *lim = joint->attr("lim")) {
      auto v = parse_floats(*lim);
      m.joint_lim_lower.push_back(v[0]);
      m.joint_lim_upper.push_back(v[1]);
      m.joint_lim_stiffness.push_back(
          std::stod(defaults_.get("joint", joint, "lim_stiffness", "0")));
    } else {
      m.joint_lim_lower.push_back(-1e9);
      m.joint_lim_upper.push_back(1e9);
      m.joint_lim_stiffness.push_back(0);
    }
    int jidx = (int)m.joint_type.size() - 1;

    if (const XmlNode *body = link->find("body")) parse_body(m, body, jidx);
    for (auto *child : link->find_all("link")) parse_link(m, child, jidx);
  }

  void parse_body(Model &m, const XmlNode *el, int jidx) {
    BodyAux aux;
    std::string bt = *el->attr("type");
    m.body_joint.push_back(jidx);
    m.body_names.push_back(*el->attr("name"));
    Vec3 pos = vec3_of(el->attr("pos"), {0, 0, 0});
    Vec4 q = quat_of(el->attr("quat"));
    if (auto *d = el->attr("density")) aux.density = std::stod(*d);
    double size[3] = {0.1, 0.1, 0.1};
    double mass = 0, inertia[3] = {0, 0, 0};
    int gtype;
    if (bt == "cuboid") {
      gtype = G_CUBOID;
      auto v = parse_floats(*el->attr("size"));
      for (int i = 0; i < 3; i++) size[i] = v[i];
      mass = aux.density * size[0] * size[1] * size[2];
      inertia[0] = mass / 12.0 * (size[1] * size[1] + size[2] * size[2]);
      inertia[1] = mass / 12.0 * (size[0] * size[0] + size[2] * size[2]);
      inertia[2] = mass / 12.0 * (size[0] * size[0] + size[1] * size[1]);
      if (auto *r = el->attr("general_contact_resolution")) {
        auto v2 = parse_floats(*r);
        aux.cuboid_res = {(int)v2[0], (int)v2[1], (int)v2[2]};
      }
    } else if (bt == "cylinder") {
      gtype = G_CYLINDER;
      double r = std::stod(*el->attr("radius"));
      double hl = std::stod(*el->attr("length")) / 2.0;
      size[0] = r; size[1] = hl; size[2] = 0;
      mass = aux.density * M_PI * r * r * 2 * hl;
      double Iz = 0.5 * mass * r * r;
      double Ix = mass * (3 * r * r + 4 * hl * hl) / 12.0;
      inertia[0] = Ix; inertia[1] = Ix; inertia[2] = Iz;
      if (auto *a = el->attr("general_contact_angle_resolution")) {
        aux.angle_res = (int)std::stod(*a);
        auto *rr = el->attr("general_contact_radius_resolution");
        aux.radius_res = rr ? (int)std::stod(*rr) : 2;
      }
    } else if (bt == "sphere") {
      gtype = G_SPHERE;
      double r = std::stod(*el->attr("radius"));
      size[0] = r; size[1] = 0; size[2] = 0;
      mass = aux.density * 4.0 / 3.0 * M_PI * r * r * r;
      inertia[0] = inertia[1] = inertia[2] = 0.4 * mass * r * r;
    } else if (bt == "mesh") {
      gtype = G_MESH;
      size[0] = size[1] = size[2] = mesh_extent_;
      mass = aux.density * size[0] * size[1] * size[2];
      double I = mass / 12.0 * 2 * mesh_extent_ * mesh_extent_;
      inertia[0] = inertia[1] = inertia[2] = I;
      auto *tt = el->attr("transform_type");
      aux.pos_is_world = tt && *tt == "OBJ_TO_WORLD";
    } else if (bt == "abstract") {
      gtype = G_ABSTRACT;
      size[0] = size[1] = size[2] = mesh_extent_;
      mass = std::stod(*el->attr("mass"));
      auto v = parse_floats(*el->attr("inertia"));
      for (int i = 0; i < 3; i++) inertia[i] = v[i];
      if (auto *coll = el->find("collision")) {
        aux.raw_points = load_points(base_dir_ + "/" + *coll->attr("contacts"));
        // collision pos/quat maps MESH space -> BODY frame; compose with the
        // body's own pos/quat (parsed just below into `pos`/`q`) for
        // joint-frame points (matches xml_parser.py; in the reference dclaw
        // assets body∘collision == identity).
        Vec3 cp = vec3_of(coll->attr("pos"), {0, 0, 0});
        Vec4 cq = quat_of(coll->attr("quat"));
        for (size_t i = 0; i + 2 < aux.raw_points.size(); i += 3) {
          double out[3], out2[3];
          quat_rotate(cq, &aux.raw_points[i], out);
          for (int k = 0; k < 3; k++) out[k] += cp[k];
          quat_rotate(q, out, out2);
          for (int k = 0; k < 3; k++) aux.raw_points[i + k] = out2[k] + pos[k];
        }
        aux.points_in_joint_frame = true;
      }
    } else {
      throw std::runtime_error("unknown body type " + bt);
    }
    m.body_gtype.push_back(gtype);
    for (double x : pos) m.body_pos.push_back(x);
    for (double x : q) m.body_quat.push_back(x);
    for (int i = 0; i < 3; i++) m.body_size.push_back(size[i]);
    m.body_mass.push_back(mass);
    for (int i = 0; i < 3; i++) m.body_inertia.push_back(inertia[i]);
    aux_.push_back(std::move(aux));
  }

  static std::vector<double> load_points(const std::string &path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open " + path);
    int n;
    f >> n;
    std::vector<double> out(3 * n);
    for (int i = 0; i < 3 * n; i++) f >> out[i];
    return out;
  }

  // resolve OBJ_TO_WORLD bodies + generate contact point clouds (joint frame)
  void zero_config_frames(Model &m) {
    size_t J = m.joint_type.size();
    std::vector<Vec3> wp(J);
    std::vector<Vec4> wq(J);
    for (size_t j = 0; j < J; j++) {
      Vec3 pp = {0, 0, 0};
      Vec4 pq = {1, 0, 0, 0};
      if (m.joint_parent[j] >= 0) {
        pp = wp[m.joint_parent[j]];
        pq = wq[m.joint_parent[j]];
      }
      double r[3];
      quat_rotate(pq, &m.joint_pos[3 * j], r);
      wp[j] = {pp[0] + r[0], pp[1] + r[1], pp[2] + r[2]};
      Vec4 jq = {m.joint_quat[4 * j], m.joint_quat[4 * j + 1],
                 m.joint_quat[4 * j + 2], m.joint_quat[4 * j + 3]};
      wq[j] = quat_mul(pq, jq);
    }
    for (size_t b = 0; b < m.body_gtype.size(); b++) {
      if (aux_[b].pos_is_world) {
        int j = m.body_joint[b];
        Vec4 inv = quat_conj(wq[j]);
        double d[3] = {m.body_pos[3 * b] - wp[j][0],
                       m.body_pos[3 * b + 1] - wp[j][1],
                       m.body_pos[3 * b + 2] - wp[j][2]};
        double out[3];
        quat_rotate(inv, d, out);
        for (int k = 0; k < 3; k++) m.body_pos[3 * b + k] = out[k];
        Vec4 bq = {m.body_quat[4 * b], m.body_quat[4 * b + 1],
                   m.body_quat[4 * b + 2], m.body_quat[4 * b + 3]};
        Vec4 nq = quat_mul(inv, bq);
        for (int k = 0; k < 4; k++) m.body_quat[4 * b + k] = nq[k];
      }
      generate_points(m, (int)b);
    }
  }

  void push_point_joint_frame(Model &m, int b, const double *p_body) {
    // body frame -> joint frame
    Vec4 bq = {m.body_quat[4 * b], m.body_quat[4 * b + 1],
               m.body_quat[4 * b + 2], m.body_quat[4 * b + 3]};
    double out[3];
    quat_rotate(bq, p_body, out);
    m.cp_pos.push_back(out[0] + m.body_pos[3 * b]);
    m.cp_pos.push_back(out[1] + m.body_pos[3 * b + 1]);
    m.cp_pos.push_back(out[2] + m.body_pos[3 * b + 2]);
    m.cp_body.push_back(b);
  }

  void generate_points(Model &m, int b) {
    const BodyAux &aux = aux_[b];
    if (!aux.raw_points.empty()) {
      // abstract: already in joint frame
      for (size_t i = 0; i + 2 < aux.raw_points.size(); i += 3) {
        for (int k = 0; k < 3; k++) m.cp_pos.push_back(aux.raw_points[i + k]);
        m.cp_body.push_back(b);
      }
      return;
    }
    if (!aux.cuboid_res.empty()) {
      int nx = std::max(aux.cuboid_res[0], 2), ny = std::max(aux.cuboid_res[1], 2),
          nz = std::max(aux.cuboid_res[2], 2);
      double hx = m.body_size[3 * b] / 2, hy = m.body_size[3 * b + 1] / 2,
             hz = m.body_size[3 * b + 2] / 2;
      for (int i = 0; i < nx; i++)
        for (int j = 0; j < ny; j++)
          for (int k = 0; k < nz; k++) {
            double p[3] = {-hx + 2 * hx * i / (nx - 1),
                           -hy + 2 * hy * j / (ny - 1),
                           -hz + 2 * hz * k / (nz - 1)};
            bool surf = i == 0 || i == nx - 1 || j == 0 || j == ny - 1 ||
                        k == 0 || k == nz - 1;
            if (surf) push_point_joint_frame(m, b, p);
          }
      return;
    }
    if (aux.angle_res > 0) {
      int A = std::max(aux.angle_res, 3), R = std::max(aux.radius_res, 1);
      double r = m.body_size[3 * b], hl = m.body_size[3 * b + 1];
      for (double z : {-hl, hl}) {
        double c[3] = {0, 0, z};
        push_point_joint_frame(m, b, c);
        for (int k = 1; k <= R; k++) {
          double rr = r * k / R;
          for (int a = 0; a < A; a++) {
            double th = 2 * M_PI * a / A;
            double p[3] = {rr * std::cos(th), rr * std::sin(th), z};
            push_point_joint_frame(m, b, p);
          }
        }
      }
    }
  }

  void parse_tactile(Model &m, const XmlNode *el) {
    int b = body_index(m, *el->attr("body"));
    m.tac_body.push_back(b);
    m.tac_names.push_back(*el->attr("name"));
    for (const char *k : {"kn", "kt", "mu", "damping"})
      m.tac_params.push_back(std::stod(defaults_.get(
          "tactile", el, k,
          strcmp(k, "kn") == 0 ? "1e2" : strcmp(k, "damping") == 0 ? "0" : "1")));
    std::string type = *el->attr("type");
    int count = 0;
    if (type == "rect_array") {
      auto res = parse_floats(*el->attr("resolution"));
      int rows = (int)res[0], cols = (int)res[1];
      Vec3 p0 = vec3_of(el->attr("rect_pos0"), {0, 0, 0});
      Vec3 p1 = vec3_of(el->attr("rect_pos1"), {0, 0, 0});
      Vec3 a0 = vec3_of(el->attr("axis0"), {1, 0, 0});
      Vec3 a1 = vec3_of(el->attr("axis1"), {0, 1, 0});
      auto norm3 = [](Vec3 &v) {
        double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
        for (auto &x : v) x /= n;
      };
      norm3(a0); norm3(a1);
      double d[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
      double s0 = d[0] * a0[0] + d[1] * a0[1] + d[2] * a0[2];
      double s1 = d[0] * a1[0] + d[1] * a1[1] + d[2] * a1[2];
      Vec3 n = {a0[1] * a1[2] - a0[2] * a1[1], a0[2] * a1[0] - a0[0] * a1[2],
                a0[0] * a1[1] - a0[1] * a1[0]};
      // marker grid in body frame -> joint frame
      Vec4 bq = {m.body_quat[4 * b], m.body_quat[4 * b + 1],
                 m.body_quat[4 * b + 2], m.body_quat[4 * b + 3]};
      double bp[3] = {m.body_pos[3 * b], m.body_pos[3 * b + 1],
                      m.body_pos[3 * b + 2]};
      for (int rr = 0; rr < rows; rr++)
        for (int cc = 0; cc < cols; cc++) {
          double fr = rows > 1 ? (double)rr / (rows - 1) : 0;
          double fc = cols > 1 ? (double)cc / (cols - 1) : 0;
          double p[3];
          for (int k = 0; k < 3; k++)
            p[k] = p0[k] + fr * s0 * a0[k] + fc * s1 * a1[k];
          double out[3];
          quat_rotate(bq, p, out);
          for (int k = 0; k < 3; k++) m.tac_pos.push_back(out[k] + bp[k]);
          double vec[3];
          quat_rotate(bq, n.data(), vec);
          for (int k = 0; k < 3; k++) m.tac_normal.push_back(vec[k]);
          quat_rotate(bq, a0.data(), vec);
          for (int k = 0; k < 3; k++) m.tac_axis0.push_back(vec[k]);
          quat_rotate(bq, a1.data(), vec);
          for (int k = 0; k < 3; k++) m.tac_axis1.push_back(vec[k]);
          m.tac_image_pos.push_back(rr);
          m.tac_image_pos.push_back(cc);
          count++;
        }
    } else if (type == "abstract") {
      // sensor pos/quat maps MESH-space spec coords -> BODY frame; compose
      // with the owning body's pos/quat for joint-frame markers (matches
      // xml_parser.py — body∘sensor == identity in the reference assets).
      Vec3 sp0 = vec3_of(el->attr("pos"), {0, 0, 0});
      Vec4 sq0 = quat_of(el->attr("quat"));
      Vec4 bq = {m.body_quat[4 * b], m.body_quat[4 * b + 1],
                 m.body_quat[4 * b + 2], m.body_quat[4 * b + 3]};
      Vec3 bp = {m.body_pos[3 * b], m.body_pos[3 * b + 1],
                 m.body_pos[3 * b + 2]};
      Vec4 sq = quat_mul(bq, sq0);
      double spr[3];
      quat_rotate(bq, sp0.data(), spr);
      Vec3 sp = {bp[0] + spr[0], bp[1] + spr[1], bp[2] + spr[2]};
      std::ifstream f(base_dir_ + "/" + *el->attr("spec"));
      if (!f) throw std::runtime_error("cannot open tactile spec");
      int n;
      f >> n;
      f.ignore();
      std::string line;
      for (int i = 0; i < n; i++) {
        std::getline(f, line);
        // five quoted vectors: pos, image_pos, normal, axis0, axis1
        std::vector<std::vector<double>> fields;
        size_t pos = 0;
        while (fields.size() < 5) {
          size_t a = line.find('"', pos);
          size_t e = line.find('"', a + 1);
          if (a == std::string::npos || e == std::string::npos)
            throw std::runtime_error("bad tactile spec line");
          fields.push_back(parse_floats(line.substr(a + 1, e - a - 1)));
          pos = e + 1;
        }
        double out[3];
        quat_rotate(sq, fields[0].data(), out);
        for (int k = 0; k < 3; k++) m.tac_pos.push_back(out[k] + sp[k]);
        quat_rotate(sq, fields[2].data(), out);
        for (int k = 0; k < 3; k++) m.tac_normal.push_back(out[k]);
        quat_rotate(sq, fields[3].data(), out);
        for (int k = 0; k < 3; k++) m.tac_axis0.push_back(out[k]);
        quat_rotate(sq, fields[4].data(), out);
        for (int k = 0; k < 3; k++) m.tac_axis1.push_back(out[k]);
        m.tac_image_pos.push_back((int)fields[1][0]);
        m.tac_image_pos.push_back((int)fields[1][1]);
        count++;
      }
    } else {
      throw std::runtime_error("unknown tactile type " + type);
    }
    m.tac_count.push_back(count);
  }
};

}  // namespace tsim

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

struct TsimBlob {
  tsim::Model *model;
  char *error;
  // packed name blobs: NUL-separated
  std::string joint_names, body_names, tac_names, ee_names;
};

TsimBlob *tsim_compile(const char *path, double mesh_fallback_extent) {
  auto *blob = new TsimBlob{nullptr, nullptr};
  try {
    tsim::Compiler c(path, mesh_fallback_extent);
    blob->model = new tsim::Model(c.compile());
    auto join = [](const std::vector<std::string> &v) {
      std::string out;
      for (auto &s : v) {
        out += s;
        out.push_back('\0');
      }
      return out;
    };
    blob->joint_names = join(blob->model->joint_names);
    blob->body_names = join(blob->model->body_names);
    blob->tac_names = join(blob->model->tac_names);
    blob->ee_names = join(blob->model->ee_names);
  } catch (const std::exception &e) {
    blob->error = strdup(e.what());
  }
  return blob;
}

const char *tsim_error(TsimBlob *b) { return b->error; }

void tsim_free(TsimBlob *b) {
  delete b->model;
  free(b->error);
  delete b;
}

// scalar queries
double tsim_timestep(TsimBlob *b) { return b->model->timestep; }
int tsim_integrator(TsimBlob *b) { return b->model->integrator; }
int tsim_has_ground(TsimBlob *b) { return b->model->has_ground; }
double tsim_solver_tol(TsimBlob *b) { return b->model->solver_tol; }
int tsim_solver_max_iter(TsimBlob *b) { return b->model->solver_max_iter; }
int tsim_njoints(TsimBlob *b) { return (int)b->model->joint_type.size(); }
int tsim_nbodies(TsimBlob *b) { return (int)b->model->body_gtype.size(); }
int tsim_ndof(TsimBlob *b) { return b->model->ndof_q(); }
int tsim_npoints(TsimBlob *b) { return (int)b->model->cp_body.size(); }
int tsim_npairs(TsimBlob *b) { return (int)b->model->pair_general.size(); }
int tsim_nmotors(TsimBlob *b) { return (int)b->model->motor_joint.size(); }
int tsim_nsensors(TsimBlob *b) { return (int)b->model->tac_body.size(); }
int tsim_nmarkers(TsimBlob *b) { return (int)(b->model->tac_pos.size() / 3); }
int tsim_nee(TsimBlob *b) { return (int)b->model->ee_joint.size(); }

// array pointers (valid until tsim_free)
#define ARR(name, member) \
  const void *tsim_##name(TsimBlob *b) { return b->model->member.data(); }
ARR(joint_type, joint_type)
ARR(joint_parent, joint_parent)
ARR(joint_pos, joint_pos)
ARR(joint_quat, joint_quat)
ARR(joint_axis0, joint_axis0)
ARR(joint_axis1, joint_axis1)
ARR(joint_damping, joint_damping)
ARR(joint_lim_lower, joint_lim_lower)
ARR(joint_lim_upper, joint_lim_upper)
ARR(joint_lim_stiffness, joint_lim_stiffness)
ARR(body_gtype, body_gtype)
ARR(body_joint, body_joint)
ARR(body_pos, body_pos)
ARR(body_quat, body_quat)
ARR(body_size, body_size)
ARR(body_mass, body_mass)
ARR(body_inertia, body_inertia)
ARR(cp_pos, cp_pos)
ARR(cp_body, cp_body)
ARR(pair_general, pair_general)
ARR(pair_primitive, pair_primitive)
ARR(pair_params, pair_params)
ARR(motor_joint, motor_joint)
ARR(motor_is_position, motor_is_position)
ARR(motor_P, motor_P)
ARR(motor_D, motor_D)
ARR(motor_lo, motor_lo)
ARR(motor_hi, motor_hi)
ARR(tac_body, tac_body)
ARR(tac_count, tac_count)
ARR(tac_pos, tac_pos)
ARR(tac_normal, tac_normal)
ARR(tac_axis0, tac_axis0)
ARR(tac_axis1, tac_axis1)
ARR(tac_params, tac_params)
ARR(tac_image_pos, tac_image_pos)
ARR(ee_joint, ee_joint)
ARR(ee_pos, ee_pos)
#undef ARR

const double *tsim_gravity(TsimBlob *b) { return b->model->gravity; }
const double *tsim_ground_pos(TsimBlob *b) { return b->model->ground_pos; }
const double *tsim_ground_normal(TsimBlob *b) {
  return b->model->ground_normal;
}
const char *tsim_joint_names(TsimBlob *b) { return b->joint_names.c_str(); }
const char *tsim_body_names(TsimBlob *b) { return b->body_names.c_str(); }
const char *tsim_tac_names(TsimBlob *b) { return b->tac_names.c_str(); }
const char *tsim_ee_names(TsimBlob *b) { return b->ee_names.c_str(); }

}  // extern "C"
