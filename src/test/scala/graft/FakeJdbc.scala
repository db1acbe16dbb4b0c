package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Types => SqlTypes}

/** A minimal in-memory JDBC stack (JDK-only, no driver jars) serving the
  * reference's contoso `products` fixture
  * (metadata_ingestion/data/samples/contoso_sqlite_instructions.sql):
  * `products(product_id INT, name TEXT, price DOUBLE)` with rows
  * (10,'Phone',699.0), (20,'Headphones',199.0), (30,'Tablet',499.0).
  *
  * Implements exactly the JDBC surface Spark's jdbc source touches —
  * Driver.connect → Connection.prepareStatement → PreparedStatement
  * .executeQuery → ResultSet.{getMetaData,next,getInt/getString/getDouble,
  * wasNull} — via reflection proxies, so the real
  * `spark.read.format("jdbc")` path (DriverRegistry, dialect resolution,
  * schema probe `WHERE 1=0`, column-pruned data query) executes end-to-end.
  */
object FakeJdbc {

  val Url = "jdbc:graftfake:contoso"
  val DriverClass = "graft.FakeJdbcDriver"

  final case class Col(name: String, sqlType: Int, typeName: String)

  val cols: Seq[Col] = Seq(
    Col("product_id", SqlTypes.INTEGER, "INT"),
    Col("name", SqlTypes.VARCHAR, "TEXT"),
    Col("price", SqlTypes.DOUBLE, "DOUBLE"))

  val rows: Seq[Seq[Any]] = Seq(
    Seq(10, "Phone", 699.0),
    Seq(20, "Headphones", 199.0),
    Seq(30, "Tablet", 499.0))

  /** Record of every SQL Spark actually executed (assertable in specs). */
  val executed = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Last connection Properties Spark handed to connect() — lets specs
    * assert which credentials actually reached the driver.
    */
  @volatile var lastConnectProps: java.util.Properties = new java.util.Properties()

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
    case java.lang.Double.TYPE  => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE   => java.lang.Float.valueOf(0.0f)
    case java.lang.Short.TYPE   => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE    => java.lang.Byte.valueOf(0.toByte)
    case _                      => null
  }

  /** Interface proxy: `handler` covers the methods Spark calls with
    * meaningful results; everything else returns a type-appropriate default
    * (JDBC interfaces are enormous; Spark touches a handful of methods).
    */
  private def proxy[T](clazz: Class[T])(
      handler: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array(clazz),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val key = (m.getName, if (args == null) Seq.empty[AnyRef] else args.toSeq)
          if (handler.isDefinedAt(key)) handler(key)
          else defaultFor(m.getReturnType)
        }
      }).asInstanceOf[T]

  def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", args) if args.nonEmpty =>
        statement(args.head.asInstanceOf[String])
      case ("isValid", _) => java.lang.Boolean.TRUE
      case ("getMetaData", _) =>
        // Spark 4.1 probes database/driver versions at connect time
        proxy(classOf[java.sql.DatabaseMetaData]) {
          case ("getDatabaseProductName", _) => "graftfake"
          case ("getDatabaseMajorVersion", _) => Integer.valueOf(1)
          case ("getDatabaseMinorVersion", _) => Integer.valueOf(0)
          case ("getDriverMajorVersion", _) => Integer.valueOf(1)
          case ("getDriverMinorVersion", _) => Integer.valueOf(0)
          case ("getURL", _) => Url
        }
    }

  private def statement(sql: String): java.sql.PreparedStatement =
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", _) =>
        executed.add(sql)
        resultSet(sql)
      case ("toString", _) => s"FakePreparedStatement($sql)"
    }

  /** Serve the probe (`WHERE 1=0` → zero rows) or the data query, projecting
    * the columns the SQL names in order — Spark's getters read by POSITION
    * in its pruned schema, so honoring the SELECT list is load-bearing.
    */
  private def resultSet(sql: String): java.sql.ResultSet = {
    val upper = sql.toUpperCase
    val selectList = sql.substring(
      upper.indexOf("SELECT") + 6, upper.indexOf("FROM")).trim
    val selected: Seq[Int] =
      if (selectList == "*") cols.indices
      else if (selectList == "1") Seq.empty // COUNT-style probe: no columns
      else selectList.split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
        .map(n => cols.indexWhere(_.name == n) match {
          case -1 => throw new java.sql.SQLException(s"no column $n in fixture")
          case i  => i
        })
    val data: Seq[Seq[Any]] =
      if (upper.contains("1=0") || upper.contains("1 = 0")) Seq.empty
      else rows.map(r => selected.map(r))
    var cursor = -1
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        cursor += 1
        java.lang.Boolean.valueOf(cursor < data.size)
      case ("getMetaData", _) => metaData(selected)
      case ("getInt", Seq(i: Integer)) =>
        Integer.valueOf(data(cursor)(i - 1).asInstanceOf[Int])
      case ("getLong", Seq(i: Integer)) =>
        java.lang.Long.valueOf(data(cursor)(i - 1).asInstanceOf[Int].toLong)
      case ("getString", Seq(i: Integer)) =>
        data(cursor)(i - 1).asInstanceOf[String]
      case ("getDouble", Seq(i: Integer)) =>
        java.lang.Double.valueOf(data(cursor)(i - 1).asInstanceOf[Double])
      case ("wasNull", _) => java.lang.Boolean.FALSE
    }
  }

  private def metaData(selected: Seq[Int]): java.sql.ResultSetMetaData =
    proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(selected.size)
      case ("getColumnLabel", Seq(i: Integer)) => cols(selected(i - 1)).name
      case ("getColumnName", Seq(i: Integer))  => cols(selected(i - 1)).name
      case ("getColumnType", Seq(i: Integer)) =>
        Integer.valueOf(cols(selected(i - 1)).sqlType)
      case ("getColumnTypeName", Seq(i: Integer)) =>
        cols(selected(i - 1)).typeName
      case ("getPrecision", Seq(_: Integer)) => Integer.valueOf(0)
      case ("getScale", Seq(_: Integer))     => Integer.valueOf(0)
      case ("isSigned", Seq(_: Integer))     => java.lang.Boolean.TRUE
      case ("isNullable", Seq(_: Integer)) =>
        Integer.valueOf(java.sql.ResultSetMetaData.columnNullable)
    }
}

/** Registered with java.sql.DriverManager by Spark's DriverRegistry via the
  * `driver` option (needs a public no-arg constructor and a real class —
  * the rest of the stack can be proxies).
  */
class FakeJdbcDriver extends java.sql.Driver {
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) {
      FakeJdbc.lastConnectProps = info
      FakeJdbc.connection()
    } else null
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftfake:")
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
